"""WFST toolbox tests: property/equivalence tests on small machines, in the
style of the reference's fstext tests (determinize-star-test.cc etc. assert
pre/post-transform equivalence on random FSTs)."""

import math
import random

import numpy as np
import pytest

from voicebridge_tpu.fst import (Fst, compose, determinize_star,
                                 minimize_encoded, remove_eps_local,
                                 rm_epsilon, shortest_distance, shortest_path)
from voicebridge_tpu.fst.core import EPS, ZERO, linear_fst
from voicebridge_tpu.fst.push import push_special


def all_paths(f: Fst, max_len=8, max_paths=20000):
    """Brute-force map input-string -> (min cost, ostring of a min-cost path).

    DFS over (state, istring); epsilon input arcs consume no input symbol.
    Returns dict for equivalence comparison of small machines.
    """
    out = {}
    stack = [(f.start, (), (), 0.0, 0)]
    seen = 0
    while stack and seen < max_paths:
        s, istr, ostr, cost, steps = stack.pop()
        seen += 1
        if f.finals[s] != ZERO:
            total = cost + f.finals[s]
            key = istr
            if key not in out or total < out[key][0] - 1e-9 or (
                abs(total - out[key][0]) <= 1e-9 and ostr < out[key][1]
            ):
                out[key] = (total, ostr)
        if steps >= max_len * 3:
            continue
        for a in f.arcs[s]:
            ni = istr + ((a.ilabel,) if a.ilabel != EPS else ())
            if len(ni) > max_len:
                continue
            no = ostr + ((a.olabel,) if a.olabel != EPS else ())
            stack.append((a.nextstate, ni, no, cost + a.weight, steps + 1))
    return out


def assert_equivalent(f, g, max_len=8):
    pf, pg = all_paths(f, max_len), all_paths(g, max_len)
    assert set(pf.keys()) == set(pg.keys()), (
        f"accepted input sets differ: only-f={list(set(pf)-set(pg))[:5]} "
        f"only-g={list(set(pg)-set(pf))[:5]}")
    for k in pf:
        cf, of = pf[k]
        cg, og = pg[k]
        assert abs(cf - cg) < 1e-4, f"cost mismatch on {k}: {cf} vs {cg}"
        assert of == og, f"output mismatch on {k}: {of} vs {og}"


def random_functional_fst(rng, num_words=6, max_len=4, nsyms=5):
    """Union of linear input->output word mappings with shared suffix state =
    functional by construction, nondeterministic, with some eps arcs."""
    f = Fst()
    start = f.add_state()
    f.set_start(start)
    final = f.add_state()
    f.set_final(final, rng.uniform(0, 1))
    seen_inputs = set()
    for _ in range(num_words):
        n = rng.randint(1, max_len)
        istr = tuple(rng.randint(1, nsyms) for _ in range(n))
        if istr in seen_inputs:
            continue
        seen_inputs.add(istr)
        ostr = [rng.randint(1, nsyms) for _ in range(rng.randint(0, max_len))]
        s = start
        # pad out to same length with eps
        k = max(len(istr), len(ostr))
        for i in range(k):
            ns = final if i == k - 1 else f.add_state()
            il = istr[i] if i < len(istr) else EPS
            ol = ostr[i] if i < len(ostr) else EPS
            f.add_arc(s, il, ol, rng.uniform(0, 2), ns)
            s = ns
        # duplicate path with worse weight => nondeterminism, same function
        if rng.random() < 0.5:
            s = start
            for i in range(k):
                ns = final if i == k - 1 else f.add_state()
                il = istr[i] if i < len(istr) else EPS
                ol = ostr[i] if i < len(ostr) else EPS
                f.add_arc(s, il, ol, rng.uniform(2, 4), ns)
                s = ns
    return f


class TestCore:
    def test_text_roundtrip(self):
        f = Fst.from_text("0 1 1 2 0.5\n1 2 3 0\n2 1.5\n")
        assert f.num_states == 3 and f.num_arcs == 2
        g = Fst.from_text(f.to_text())
        assert_equivalent(f, g)

    def test_connect_trims(self):
        f = Fst()
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, 1, 1, 0.0, s1)
        f.add_arc(s0, 2, 2, 0.0, s2)  # s2 is a dead end
        f.add_arc(s3, 3, 3, 0.0, s1)  # s3 unreachable
        f.set_final(s1, 0.0)
        f.connect()
        assert f.num_states == 2 and f.num_arcs == 1

    def test_save_load(self, tmp_path):
        f = Fst.from_text("0 1 1 2 0.5\n1 0 2 1 0.25\n1 0.75\n")
        f.save(tmp_path / "f.npz")
        g = Fst.load(tmp_path / "f.npz")
        assert_equivalent(f, g, max_len=5)


class TestCompose:
    def test_simple_chain(self):
        a = linear_fst([1, 2], [3, 4])
        b = linear_fst([3, 4], [5, 6])
        c = compose(a, b)
        paths = all_paths(c)
        assert paths == {(1, 2): (0.0, (5, 6))}

    def test_weights_add(self):
        a = Fst.from_text("0 1 1 2 0.5\n1 0.25\n")
        b = Fst.from_text("0 1 2 3 1.0\n1 0.125\n")
        c = compose(a, b)
        paths = all_paths(c)
        assert set(paths) == {(1,)}
        cost, ostr = paths[(1,)]
        assert abs(cost - 1.875) < 1e-6 and ostr == (3,)

    def test_eps_both_sides(self):
        # left emits eps outputs, right consumes eps inputs between matches
        a = Fst.from_text("0 1 1 0\n1 2 0 5\n2 3 2 6\n3\n")  # 1:eps eps:5 2:6
        b = Fst.from_text("0 1 5 7\n1 2 0 8\n2 3 6 9\n3\n")
        c = compose(a, b)
        paths = all_paths(c)
        assert (1, 2) in paths
        # outputs: 7 (from 5), 8 (right eps), 9 (from 6)
        assert paths[(1, 2)][1] == (7, 8, 9)

    def test_against_bruteforce_random(self):
        rng = random.Random(7)
        for trial in range(5):
            a = random_functional_fst(rng, nsyms=3)
            b = Fst()
            s0 = b.add_state()
            b.set_start(s0)
            b.set_final(s0, 0.0)
            for sym in range(1, 4):
                b.add_arc(s0, sym, sym + 10, 0.1 * sym, s0)
            c = compose(a, b)
            pa = all_paths(a, max_len=5)
            pc = all_paths(c, max_len=5)
            assert set(pc) == set(pa)
            for k, (cost, ostr) in pa.items():
                ccost, costr = pc[k]
                want = tuple(o + 10 for o in ostr)
                assert costr == want
                assert abs(ccost - (cost + sum(0.1 * o for o in ostr))) < 1e-4


class TestDeterminizeStar:
    def _is_ideterministic(self, f):
        for s in f.states():
            labels = [a.ilabel for a in f.arcs[s] if a.ilabel != EPS]
            if len(labels) != len(set(labels)):
                return False
        return True

    def test_simple_union(self):
        # two paths for same input, different weights: min survives
        f = Fst()
        s0 = f.add_state(); s1 = f.add_state(); s2 = f.add_state(); s3 = f.add_state()
        f.set_start(s0)
        f.add_arc(s0, 1, 7, 1.0, s1)
        f.add_arc(s0, 1, 7, 0.5, s2)
        f.add_arc(s1, 2, 8, 0.0, s3)
        f.add_arc(s2, 2, 8, 0.0, s3)
        f.set_final(s3, 0.0)
        d = determinize_star(f)
        assert self._is_ideterministic(d)
        assert_equivalent(f, d)

    def test_removes_input_epsilons(self):
        f = Fst.from_text("0 1 0 5 0.5\n1 2 1 6 0.25\n2\n")
        d = determinize_star(f)
        assert all(a.ilabel != EPS or a.olabel != EPS for s in d.states() for a in d.arcs[s])
        assert_equivalent(f, d)

    def test_output_string_chains(self):
        # one input symbol must emit two output symbols -> eps chain
        f = Fst.from_text("0 1 1 5 0.0\n1 2 0 6 0.0\n2\n")
        d = determinize_star(f)
        assert_equivalent(f, d)

    def test_random_functional(self):
        rng = random.Random(3)
        for trial in range(8):
            f = random_functional_fst(rng)
            d = determinize_star(f)
            assert self._is_ideterministic(d), f"trial {trial} not deterministic"
            assert_equivalent(f, d, max_len=6)

    def test_log_semiring_preserves_total_mass(self):
        # stochastic union determinized in log domain stays stochastic
        f = Fst()
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        p = 0.5
        f.add_arc(s0, 1, 1, -math.log(p), s1)
        f.add_arc(s0, 1, 1, -math.log(p), s2)
        f.set_final(s1, 0.0)
        f.set_final(s2, 0.0)
        d = determinize_star(f, use_log=True)
        # total weight of input "1" should be -log(0.5)-log... i.e. sum of both
        paths = all_paths(d)
        assert abs(paths[(1,)][0] - 0.0) < 1e-5  # 0.5+0.5 = 1 -> cost 0


class TestMinimize:
    def test_merges_equivalent_states(self):
        # two identical branches should merge
        f = Fst()
        s0, s1, s2, s3 = (f.add_state() for _ in range(4))
        f.set_start(s0)
        f.add_arc(s0, 1, 1, 0.5, s1)
        f.add_arc(s0, 2, 2, 0.5, s2)
        f.add_arc(s1, 3, 3, 0.0, s3)
        f.add_arc(s2, 3, 3, 0.0, s3)
        f.set_final(s3, 0.0)
        m = minimize_encoded(f)
        assert m.num_states == 3  # s1,s2 merged
        assert_equivalent(f, m)

    def test_random(self):
        rng = random.Random(11)
        for _ in range(5):
            f = determinize_star(random_functional_fst(rng))
            m = minimize_encoded(f)
            assert m.num_states <= f.num_states
            assert_equivalent(f, m, max_len=6)


class TestEpsilon:
    def test_rm_epsilon(self):
        f = Fst.from_text("0 1 0 0 0.5\n1 2 1 1 0.25\n2 3 0 0 0.125\n3\n")
        g = rm_epsilon(f)
        assert all(not (a.ilabel == EPS and a.olabel == EPS)
                   for s in g.states() for a in g.arcs[s])
        assert_equivalent(f, g)

    def test_remove_eps_local_equivalent(self):
        f = Fst.from_text(
            "0 1 1 1 0.5\n1 2 0 0 0.25\n2 3 2 2 0\n0 3 3 3 0.1\n3\n")
        g = remove_eps_local(f)
        assert_equivalent(f, g)
        assert g.num_arcs <= f.num_arcs


class TestShortest:
    def test_shortest_path(self):
        f = Fst.from_text("0 1 1 1 1.0\n0 2 2 2 0.5\n1 3 3 3 0\n2 3 4 4 0.25\n3\n")
        il, ol, cost = shortest_path(f)
        assert il == [2, 4] and abs(cost - 0.75) < 1e-9

    def test_shortest_distance_reverse(self):
        f = Fst.from_text("0 1 1 1 1.0\n1 2 2 2 2.0\n2 0.5\n")
        d = shortest_distance(f, reverse=True)
        assert abs(d[0] - 3.5) < 1e-9


class TestPushSpecial:
    def test_uniform_residue(self):
        # non-stochastic machine becomes uniformly stochastic up to lambda
        f = Fst.from_text(
            "0 1 1 1 0.1\n0 2 2 2 2.0\n1 0 3 3 0.5\n2 0 4 4 1.5\n0 0.7\n")
        g = push_special(f, delta=1e-8)
        residues = []
        for s in g.states():
            tot = ZERO
            if g.finals[s] != ZERO:
                tot = g.finals[s]
            for a in g.arcs[s]:
                m = min(tot, a.weight)
                tot = m - math.log1p(math.exp(m - max(tot, a.weight))) if tot != ZERO else a.weight
            residues.append(tot)
        assert max(residues) - min(residues) < 0.01
        # path weights shift only by a per-length constant; equivalence of
        # relative ranking is preserved (same best path)
        assert shortest_path(f)[0] == shortest_path(g)[0]
