"""decode_core (batch-minor in-degree-row decoder) vs the reference-path
arc-parallel decoder in ops/viterbi.py: identical best scores and valid paths
on random epsilon-free graphs."""

import numpy as np
import jax.numpy as jnp
import pytest

from voicebridge_tpu.ops import decode_core as DC
from voicebridge_tpu.ops import viterbi as V


def random_dense_graph(rng, s=40, a=200, p=7):
    """Random epsilon-free DenseGraph with distinct weights (no argmax ties)."""
    arc_src = rng.integers(0, s, size=a).astype(np.int32)
    arc_dst = rng.integers(0, s, size=a).astype(np.int32)
    arc_pdf = rng.integers(0, p, size=a).astype(np.int32)
    arc_score = (-rng.random(a) * 3.0).astype(np.float32)
    arc_tid = (arc_pdf + 1).astype(np.int32)
    arc_oseq = rng.integers(0, 3, size=a).astype(np.int32)
    alpha0 = np.full(s, V.NEG_INF, np.float32)
    alpha0[0] = 0.0
    final_score = np.full(s, V.NEG_INF, np.float32)
    finals = rng.choice(s, size=max(2, s // 4), replace=False)
    final_score[finals] = -rng.random(len(finals)).astype(np.float32)
    return V.DenseGraph(
        num_states=s, arc_src=arc_src, arc_dst=arc_dst, arc_tid=arc_tid,
        arc_pdf=arc_pdf, arc_score=arc_score, arc_oseq=arc_oseq,
        alpha0=alpha0, start_oseq=np.zeros(s, np.int32),
        final_score=final_score, final_oseq=np.zeros(s, np.int32),
        oseqs=[(), (5,), (6, 7)])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matches_reference_decoder(seed):
    rng = np.random.default_rng(seed)
    g = random_dense_graph(rng)
    b, t, p = 3, 17, 7
    ll = rng.standard_normal((b, t, p)).astype(np.float32)
    nf = np.array([17, 9, 1], np.int32)

    plan = DC.build_emit_plan(g, d=4, k_upper=3)
    dev = DC.plan_to_device(plan)
    res = DC.decode_best_path(g, plan, dev, jnp.asarray(ll), nf,
                              acoustic_scale=0.5)

    levels = tuple(jnp.asarray(l) for l in
                   V.build_reduction_plan(g.arc_dst, g.num_states, k=4).levels)
    alpha_end, bps = V.viterbi_forward_shared(
        jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
        jnp.asarray(g.arc_score), jnp.asarray(g.alpha0),
        jnp.asarray(ll), jnp.asarray(nf), 0.5, 1e9, g.num_states)
    ref = V.backtrace_shared(g, np.asarray(alpha_end), np.asarray(bps), nf)

    for r, rr in zip(res, ref):
        assert np.isclose(r["score"], rr["score"], rtol=1e-5, atol=1e-4), \
            (r["score"], rr["score"])
        if np.isfinite(r["score"]):
            assert r["words"] == rr["words"]
            assert r["tids"] == rr["tids"]
            assert len(r["arcs"]) == len(rr["arcs"])


def test_chunked_matches_single():
    rng = np.random.default_rng(3)
    g = random_dense_graph(rng, s=30, a=150)
    b, t, p = 2, 23, 7
    ll = rng.standard_normal((b, t, p)).astype(np.float32)
    nf = np.array([23, 11], np.int32)
    plan = DC.build_emit_plan(g, d=4, k_upper=3)
    dev = DC.plan_to_device(plan)
    full = DC.decode_best_path(g, plan, dev, jnp.asarray(ll), nf, 0.7)
    chunked = DC.decode_best_path(g, plan, dev, jnp.asarray(ll), nf, 0.7,
                                  chunk=7)
    for a, c in zip(full, chunked):
        assert np.isclose(a["score"], c["score"], rtol=1e-5, atol=1e-4)
        assert a["arcs"] == c["arcs"]


def test_rowloc_fits_and_rows_cover_states():
    rng = np.random.default_rng(4)
    g = random_dense_graph(rng, s=25, a=400, p=3)
    plan = DC.build_emit_plan(g, d=4, k_upper=3)
    counts = np.diff(plan.row_start)
    assert counts.min() >= 1  # every state (incl. pad) has a row
    assert counts.max() < 32768
    # row pdf-purity: all real arcs in a row share the row's pdf
    for r in range(plan.num_rows):
        arcs = plan.row_arc[r][plan.row_arc[r] >= 0]
        if len(arcs):
            assert (g.arc_pdf[arcs] == plan.row_pdf[r]).all()


def test_beam_prunes_but_keeps_best_when_wide():
    rng = np.random.default_rng(5)
    g = random_dense_graph(rng)
    b, t, p = 2, 12, 7
    ll = rng.standard_normal((b, t, p)).astype(np.float32)
    nf = np.array([12, 12], np.int32)
    plan = DC.build_emit_plan(g, d=4)
    dev = DC.plan_to_device(plan)
    exact = DC.decode_best_path(g, plan, dev, jnp.asarray(ll), nf, 0.5)
    wide = DC.decode_best_path(g, plan, dev, jnp.asarray(ll), nf, 0.5,
                               beam=1e6)
    for a, c in zip(exact, wide):
        assert np.isclose(a["score"], c["score"], rtol=1e-5, atol=1e-4)


def test_unpacked_fallback_matches():
    """A hub state with huge in-degree forces the int16 rowloc fallback."""
    rng = np.random.default_rng(6)
    s, p = 30, 5
    # 400 arcs all into state 0 with alternating pdfs -> many rows for state 0
    a = 400
    arc_src = rng.integers(0, s, size=a).astype(np.int32)
    arc_dst = np.zeros(a, np.int32)
    arc_dst[:100] = rng.integers(1, s, size=100)  # some spread
    arc_pdf = (np.arange(a) % p).astype(np.int32)
    g = V.DenseGraph(
        num_states=s, arc_src=arc_src, arc_dst=arc_dst,
        arc_tid=arc_pdf + 1, arc_pdf=arc_pdf,
        arc_score=(-rng.random(a) * 2).astype(np.float32),
        arc_oseq=np.zeros(a, np.int32),
        alpha0=np.where(np.arange(s) == 0, 0, V.NEG_INF).astype(np.float32),
        start_oseq=np.zeros(s, np.int32),
        final_score=np.zeros(s, np.float32),
        final_oseq=np.zeros(s, np.int32), oseqs=[()])
    plan = DC.build_emit_plan(g, d=2, k_upper=3)
    assert not plan.packed
    dev = DC.plan_to_device(plan)
    b, t = 2, 9
    ll = rng.standard_normal((b, t, p)).astype(np.float32)
    nf = np.array([9, 6], np.int32)
    res = DC.decode_best_path(g, plan, dev, jnp.asarray(ll), nf, 0.5)

    levels = tuple(jnp.asarray(l) for l in
                   V.build_reduction_plan(g.arc_dst, g.num_states, k=4).levels)
    alpha_end, bps = V.viterbi_forward_shared(
        jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
        jnp.asarray(g.arc_score), jnp.asarray(g.alpha0),
        jnp.asarray(ll), jnp.asarray(nf), 0.5, 1e9, g.num_states)
    ref = V.backtrace_shared(g, np.asarray(alpha_end), np.asarray(bps), nf)
    for r, rr in zip(res, ref):
        assert np.isclose(r["score"], rr["score"], rtol=1e-5, atol=1e-4)


def test_packed_mode_used_on_hclg_like_graph():
    """pdf-per-destination graphs (reordered HCLG) pack bp to 1 byte."""
    rng = np.random.default_rng(7)
    s, p, per = 50, 6, 4
    a = s * per
    arc_src = np.repeat(np.arange(s, dtype=np.int32), per)
    arc_dst = ((arc_src + rng.integers(1, 5, size=a)) % s).astype(np.int32)
    pdf_state = rng.integers(0, p, size=s).astype(np.int32)
    arc_pdf = pdf_state[arc_dst]
    g = V.DenseGraph(
        num_states=s, arc_src=arc_src, arc_dst=arc_dst,
        arc_tid=arc_pdf + 1, arc_pdf=arc_pdf,
        arc_score=(-rng.random(a)).astype(np.float32),
        arc_oseq=np.zeros(a, np.int32),
        alpha0=np.where(np.arange(s) == 0, 0, V.NEG_INF).astype(np.float32),
        start_oseq=np.zeros(s, np.int32),
        final_score=np.zeros(s, np.float32),
        final_oseq=np.zeros(s, np.int32), oseqs=[()])
    plan = DC.build_emit_plan(g)
    assert plan.packed
    dev = DC.plan_to_device(plan)
    b, t = 2, 11
    ll = rng.standard_normal((b, t, p)).astype(np.float32)
    nf = np.array([11, 11], np.int32)
    res = DC.decode_best_path(g, plan, dev, jnp.asarray(ll), nf, 0.5)
    levels = tuple(jnp.asarray(l) for l in
                   V.build_reduction_plan(g.arc_dst, g.num_states, k=4).levels)
    alpha_end, bps = V.viterbi_forward_shared(
        jnp.asarray(g.arc_src), levels, jnp.asarray(g.arc_pdf),
        jnp.asarray(g.arc_score), jnp.asarray(g.alpha0),
        jnp.asarray(ll), jnp.asarray(nf), 0.5, 1e9, g.num_states)
    ref = V.backtrace_shared(g, np.asarray(alpha_end), np.asarray(bps), nf)
    for r, rr in zip(res, ref):
        assert np.isclose(r["score"], rr["score"], rtol=1e-5, atol=1e-4)
        assert r["arcs"] == rr["arcs"]


def test_recompute_backtrace_parity():
    """Checkpoint/recompute decode (bp budget exceeded) must reproduce the
    keep-all-backpointers result exactly."""
    rng = np.random.default_rng(7)
    g = random_dense_graph(rng, s=40, a=200)
    plan = DC.build_emit_plan(g, d=4, k_upper=3)
    dev = DC.plan_to_device(plan)
    b, p, t = 3, 7, 50
    ll = jnp.asarray(rng.standard_normal((b, t, p)), jnp.float32)
    nf = np.array([50, 37, 12], np.int32)
    keep = DC.decode_best_path(g, plan, dev, ll, nf, 0.7, chunk=16)
    rec = DC.decode_best_path(g, plan, dev, ll, nf, 0.7, chunk=16,
                              bp_bytes_budget=1)
    for a, c in zip(keep, rec):
        assert a["arcs"] == c["arcs"]
        assert a["words"] == c["words"]
        assert abs(a["score"] - c["score"]) < 1e-4
