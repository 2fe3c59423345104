"""Exact N-best Viterbi tests: compare against brute-force path enumeration
on small graphs, and end-to-end MBR decoding."""

import itertools

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from voicebridge_tpu.ops import viterbi as V

from test_viterbi_variants import random_graph

RNG = np.random.default_rng(23)


def brute_force_paths(g, ll, acwt, t_end, topn=5):
    """All T-length arc paths from init to a final state, best-first."""
    by_src = {}
    for i in range(g.num_arcs):
        by_src.setdefault(int(g.arc_src[i]), []).append(i)
    init = int(np.argmax(g.alpha0))
    results = []

    def dfs(s, t, score, arcs):
        if t == t_end:
            if g.final_score[s] > V.NEG_INF / 2:
                results.append((score + g.final_score[s], tuple(arcs)))
            return
        for i in by_src.get(s, ()):
            dfs(int(g.arc_dst[i]), t + 1,
                score + g.arc_score[i] + acwt * ll[t, g.arc_pdf[i]],
                arcs + [i])

    dfs(init, 0, float(g.alpha0[init]), [])
    results.sort(key=lambda x: -x[0])
    return results[:topn]


class TestNBest:
    def test_matches_bruteforce(self):
        g = random_graph(num_states=8, arcs_per_state=3, num_pdfs=4, seed=9)
        levels = tuple(V.build_reduction_plan(g.arc_dst, g.num_states, k=4).levels)
        t = 6
        ll = RNG.standard_normal((1, t, 4)).astype(np.float32) * 2
        nf = np.array([t], np.int32)
        nbest = 4
        alpha_end, bpa, bps = V.viterbi_nbest_forward(
            jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
            jnp.asarray(g.arc_score), jnp.asarray(g.alpha0),
            jnp.asarray(ll), jnp.asarray(nf), np.float32(1.0),
            np.float32(1e9), g.num_states, nbest)
        hyps = V.backtrace_nbest(g, alpha_end, bpa, bps, nf, nbest)[0]
        want = brute_force_paths(g, ll[0], 1.0, t, topn=nbest)
        assert hyps, "no hypotheses"
        # scores of returned hyps must match the brute-force top scores
        got_scores = [h["score"] for h in hyps]
        want_scores = [w[0] for w in want[: len(got_scores)]]
        np.testing.assert_allclose(got_scores, want_scores, rtol=1e-4,
                                   atol=1e-3)
        # best path arcs identical
        assert tuple(hyps[0]["arcs"]) == want[0][1]

    def test_nbest_1_equals_viterbi(self):
        g = random_graph(num_states=30, arcs_per_state=4, num_pdfs=6, seed=2)
        levels = tuple(V.build_reduction_plan(g.arc_dst, g.num_states).levels)
        t = 12
        ll = RNG.standard_normal((2, t, 6)).astype(np.float32)
        nf = np.array([t, t - 3], np.int32)
        a1, bp1 = V.viterbi_forward_shared(
            jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
            jnp.asarray(g.arc_score), jnp.asarray(g.alpha0), jnp.asarray(ll),
            jnp.asarray(nf), np.float32(0.7), np.float32(1e9), g.num_states)
        ref = V.backtrace_shared(g, np.asarray(a1), np.asarray(bp1), nf)
        alpha_end, bpa, bps = V.viterbi_nbest_forward(
            jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
            jnp.asarray(g.arc_score), jnp.asarray(g.alpha0), jnp.asarray(ll),
            jnp.asarray(nf), np.float32(0.7), np.float32(1e9),
            g.num_states, 3)
        nb = V.backtrace_nbest(g, alpha_end, bpa, bps, nf, 3)
        for r, hyps in zip(ref, nb):
            if r["score"] > -np.inf:
                assert abs(hyps[0]["score"] - r["score"]) < 1e-3
                assert hyps[0]["tids"] == r["tids"]

    def test_hypotheses_distinct_and_sorted(self):
        g = random_graph(num_states=20, arcs_per_state=4, num_pdfs=5, seed=4)
        levels = tuple(V.build_reduction_plan(g.arc_dst, g.num_states).levels)
        t = 10
        ll = RNG.standard_normal((1, t, 5)).astype(np.float32)
        nf = np.array([t], np.int32)
        alpha_end, bpa, bps = V.viterbi_nbest_forward(
            jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
            jnp.asarray(g.arc_score), jnp.asarray(g.alpha0), jnp.asarray(ll),
            jnp.asarray(nf), np.float32(1.0), np.float32(1e9),
            g.num_states, 4)
        hyps = V.backtrace_nbest(g, alpha_end, bpa, bps, nf, 4)[0]
        assert len(hyps) >= 2
        arcs = [tuple(h["arcs"]) for h in hyps]
        assert len(set(arcs)) == len(arcs)
        scores = [h["score"] for h in hyps]
        assert scores == sorted(scores, reverse=True)
