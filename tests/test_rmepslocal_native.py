"""Native remove-eps-local vs Python vs input: exact tropical equivalence.

The reference's RemoveEpsLocal lives in C++ (``fstext/remove-eps-local.h``);
``native/wfst.cpp RemoveEpsLocal`` is the worklist-based equivalent used by
mkgraph at HCLGa scale (the Python fixpoint version rescans the whole machine
per change and is ~1000x slower at 100k states).

Equivalence is checked EXACTLY (tropical matrix closure over the eps
subgraph), which — unlike path enumeration — handles eps cycles, the case
that makes local eps removal subtle.
"""

import itertools

import numpy as np
import pytest

from voicebridge_tpu.fst import native_bridge as NB
from voicebridge_tpu.fst.core import Fst
from voicebridge_tpu.fst.epsilon import remove_eps_local

INF = float("inf")


def string_costs(f: Fst, nsym: int, max_len: int) -> dict:
    """Exact cost of every input string up to max_len: tropical
    E* A(x1) E* A(x2) ... E* with E* the Floyd-Warshall closure of eps arcs."""
    n = f.num_states
    e = np.full((n, n), INF)
    np.fill_diagonal(e, 0.0)
    a = {x: np.full((n, n), INF) for x in range(1, nsym + 1)}
    for s in range(n):
        for arc in f.arcs[s]:
            m = e if arc.ilabel == 0 else a[arc.ilabel]
            m[s, arc.nextstate] = min(m[s, arc.nextstate], arc.weight)
    for k in range(n):
        e = np.minimum(e, e[:, k : k + 1] + e[k : k + 1, :])
    fin = np.asarray(f.finals)

    def tmm(x, y):
        return np.min(x[:, :, None] + y[None, :, :], axis=1)

    out = {}
    for ln in range(max_len + 1):
        for seq in itertools.product(range(1, nsym + 1), repeat=ln):
            m = e.copy()
            for x in seq:
                m = tmm(tmm(m, a[x]), e)
            c = float(np.min(m[f.start] + fin))
            if c < INF / 2:
                out[seq] = c
    return out


def rand_eps_fst(rng, n=7, arcs=16, eps_p=0.5, nsym=3) -> Fst:
    f = Fst()
    f.add_states(n)
    f.set_start(0)
    for _ in range(rng.integers(1, 3)):
        f.set_final(int(rng.integers(n)), float(round(rng.uniform(0, 1), 2)))
    for _ in range(arcs):
        s, d = int(rng.integers(n)), int(rng.integers(n))
        il = 0 if rng.random() < eps_p else int(rng.integers(1, nsym + 1))
        f.add_arc(s, il, il, float(round(rng.uniform(0, 1), 2)), d)
    f.connect()
    return f


@pytest.mark.skipif(not NB.available(), reason="native library not built")
def test_native_rmepslocal_exact_equivalence():
    rng = np.random.default_rng(7)
    tested = 0
    for _ in range(120):
        f = rand_eps_fst(rng)
        if f.num_states == 0:
            continue
        nat = NB.remove_eps_local(f)
        py = remove_eps_local(f)
        ref = string_costs(f, 3, 4)
        for out in (nat, py):
            got = string_costs(out, 3, 4)
            assert set(ref) == set(got)
            for k, c in ref.items():
                assert abs(c - got[k]) < 1e-4
        # size-safety: local removal must never grow the machine
        assert nat.num_states <= f.num_states
        assert nat.num_arcs <= f.num_arcs
        tested += 1
    assert tested > 80


@pytest.mark.skipif(not NB.available(), reason="native library not built")
def test_native_rmepslocal_removes_eps_chains():
    # linear eps chain a:a . eps . eps . b:b collapses to 2 arcs
    f = Fst()
    f.add_states(5)
    f.set_start(0)
    f.add_arc(0, 1, 1, 0.5, 1)
    f.add_arc(1, 0, 0, 0.25, 2)
    f.add_arc(2, 0, 0, 0.25, 3)
    f.add_arc(3, 2, 2, 0.5, 4)
    f.set_final(4, 0.0)
    nat = NB.remove_eps_local(f)
    assert nat.num_arcs == 2
    assert all(a.ilabel != 0 for s in range(nat.num_states)
               for a in nat.arcs[s])
    costs = string_costs(nat, 2, 2)
    assert abs(costs[(1, 2)] - 1.5) < 1e-6
