"""Equivalence of Viterbi kernel variants: plain gather-tree vs fused level-0,
and the windowed decode against full-backpointer decode on random graphs."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from voicebridge_tpu.ops import viterbi as V

RNG = np.random.default_rng(17)


def random_graph(num_states=50, arcs_per_state=4, num_pdfs=9, seed=0):
    rng = np.random.default_rng(seed)
    a = num_states * arcs_per_state
    arc_src = np.repeat(np.arange(num_states, dtype=np.int32), arcs_per_state)
    arc_dst = ((arc_src + rng.integers(0, 5, a)) % num_states).astype(np.int32)
    arc_dst[::arcs_per_state] = arc_src[::arcs_per_state]  # self loops
    arc_pdf = rng.integers(0, num_pdfs, a).astype(np.int32)
    arc_score = (-rng.exponential(0.5, a)).astype(np.float32)
    alpha0 = np.full(num_states, V.NEG_INF, np.float32)
    alpha0[0] = 0.0
    finals = np.full(num_states, V.NEG_INF, np.float32)
    finals[rng.integers(0, num_states, 5)] = 0.0
    return V.DenseGraph(
        num_states=num_states, arc_src=arc_src, arc_dst=arc_dst,
        arc_tid=arc_pdf + 1, arc_pdf=arc_pdf, arc_score=arc_score,
        arc_oseq=np.zeros(a, np.int32), alpha0=alpha0,
        start_oseq=np.zeros(num_states, np.int32), final_score=finals,
        final_oseq=np.zeros(num_states, np.int32), oseqs=[()])


class TestVariants:
    def test_fused_matches_plain(self):
        g = random_graph(seed=1)
        levels = tuple(V.build_reduction_plan(g.arc_dst, g.num_states).levels)
        plan = V.build_fused_plan(g)
        b, t, p = 3, 21, 9
        ll = jnp.asarray(RNG.standard_normal((b, t, p)).astype(np.float32))
        nf = np.array([21, 15, 8], np.int32)
        a1, bp1 = V.viterbi_forward_shared(
            jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
            jnp.asarray(g.arc_score), jnp.asarray(g.alpha0), ll,
            jnp.asarray(nf), np.float32(0.5), np.float32(1e9), g.num_states)
        a2, bp2 = V.viterbi_forward_shared_fused(
            plan, jnp.asarray(g.alpha0), ll, jnp.asarray(nf),
            np.float32(0.5), np.float32(1e9), g.num_states)
        np.testing.assert_allclose(np.asarray(a1), np.asarray(a2),
                                   rtol=1e-5, atol=1e-4)
        # backpointers may differ on exact ties; scores along paths must match
        p1 = V.backtrace_shared(g, np.asarray(a1), np.asarray(bp1), nf)
        p2 = V.backtrace_shared(g, np.asarray(a2), np.asarray(bp2), nf)
        for r1, r2 in zip(p1, p2):
            assert abs(r1["score"] - r2["score"]) < 1e-3

    def test_max_active_pruning(self):
        g = random_graph(num_states=60, seed=5)
        levels = tuple(V.build_reduction_plan(g.arc_dst, g.num_states).levels)
        b, t, p = 2, 15, 9
        ll = jnp.asarray(RNG.standard_normal((b, t, p)).astype(np.float32) * 3)
        nf = np.array([15, 15], np.int32)
        args = (jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
                jnp.asarray(g.arc_score), jnp.asarray(g.alpha0), ll,
                jnp.asarray(nf), np.float32(1.0), np.float32(1e9))
        a_exact, _ = V.viterbi_forward_shared(*args, g.num_states)
        a_pruned, _ = V.viterbi_forward_shared(*args, g.num_states,
                                               max_active=10)
        # at most 10 live states per frame end
        live = (np.asarray(a_pruned) > V.NEG_INF / 2).sum(axis=1)
        assert (live <= 10).all()
        # the best state survives pruning with its exact score
        be = np.asarray(a_exact).max(axis=1)
        bp = np.asarray(a_pruned).max(axis=1)
        np.testing.assert_allclose(bp, be, rtol=1e-5, atol=1e-4)

    def test_windowed_matches_full(self):
        g = random_graph(num_states=40, seed=3)
        levels = tuple(V.build_reduction_plan(g.arc_dst, g.num_states).levels)
        b, t, p = 4, 33, 9
        ll = jnp.asarray(RNG.standard_normal((b, t, p)).astype(np.float32))
        nf = np.array([33, 20, 13, 7], np.int32)
        a1, bp1 = V.viterbi_forward_shared(
            jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
            jnp.asarray(g.arc_score), jnp.asarray(g.alpha0), ll,
            jnp.asarray(nf), np.float32(1.0), np.float32(1e9), g.num_states)
        ref = V.backtrace_shared(g, np.asarray(a1), np.asarray(bp1), nf)
        win = V.viterbi_decode_windowed(g, levels, ll, nf, 1.0, 1e9, window=8)
        for r, w in zip(ref, win):
            assert abs(r["score"] - w["score"]) < 1e-3
            assert r["tids"] == w["tids"] or len(r["tids"]) == len(w["tids"])
