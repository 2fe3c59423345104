"""Banded alignment kernel (ops/align_band.py) vs the generic gather kernel.

The banded kernel must be exact: same best-path scores and same alignments
as viterbi_forward_batched on real compiled training graphs (reference
semantics: gmm-align-compiled, kaldi-master/src/gmmbin/gmm-align-compiled.cc).
"""

import numpy as np
import pytest

from voicebridge_tpu.ops import align_band as AB
from voicebridge_tpu.ops import viterbi as V
from voicebridge_tpu.steps.align import AlignmentSet, align_banded


def _random_banded_graph(rng, n_states, band=(-3, 4), num_pdfs=11):
    """Random dst-pure banded graph: linear spine (so a path always exists)
    plus random in-band arcs and self-loops."""
    pdf_of = rng.integers(0, num_pdfs, size=n_states)
    src, dst, score = [], [], []

    def add(s, d):
        src.append(s)
        dst.append(d)
        score.append(float(-rng.exponential(0.7)))

    for s in range(n_states):
        add(s, s)  # self-loop
        if s + 1 < n_states:
            add(s, s + 1)  # spine
        for _ in range(rng.integers(0, 3)):
            off = int(rng.integers(band[0], band[1] + 1))
            d = s + off
            if 0 <= d < n_states:
                add(s, d)
    a = len(src)
    alpha0 = np.full(n_states, V.NEG_INF, np.float32)
    alpha0[0] = 0.0
    final = np.full(n_states, V.NEG_INF, np.float32)
    final[n_states - 1] = 0.0
    dst = np.asarray(dst, np.int32)
    return V.DenseGraph(
        num_states=n_states, arc_src=np.asarray(src, np.int32), arc_dst=dst,
        arc_tid=pdf_of[dst].astype(np.int32), arc_pdf=pdf_of[dst].astype(np.int32),
        arc_score=np.asarray(score, np.float32), arc_oseq=np.zeros(a, np.int32),
        alpha0=alpha0, start_oseq=np.zeros(n_states, np.int32),
        final_score=final, final_oseq=np.zeros(n_states, np.int32), oseqs=[()])


def _align_generic(graphs, loglikes, num_frames, acoustic_scale):
    import jax.numpy as jnp
    p = V.pad_graphs(graphs)
    alpha_end, bps = V.viterbi_forward_batched(
        p["arc_src"], p["levels"], p["arc_pdf"], p["arc_score"], p["alpha0"],
        jnp.asarray(loglikes), jnp.asarray(num_frames), np.float32(acoustic_scale),
        np.float32(1e9), p["num_states"])
    arcs, ok, end_state, score = V.backtrace_batched_device(
        jnp.asarray(p["arc_src"]), alpha_end, jnp.asarray(p["final_score"]),
        bps, jnp.asarray(num_frames))
    return V.assemble_batched_results(
        graphs, np.asarray(arcs), np.asarray(ok), np.asarray(end_state),
        np.asarray(score), np.asarray(num_frames))


def _parity(graphs, num_pdfs, seed=0, t=37):
    rng = np.random.default_rng(seed)
    b = len(graphs)
    nf = rng.integers(max(5, t // 2), t + 1, size=b).astype(np.int32)
    nf[0] = t
    ll = rng.standard_normal((b, t, num_pdfs)).astype(np.float32)
    plan = AB.build_band_plan(graphs)
    assert plan is not None
    got = align_banded(plan, graphs, ll, nf, acoustic_scale=0.37)
    want = _align_generic(graphs, ll, nf, acoustic_scale=0.37)
    for g, w in zip(got, want):
        assert np.isfinite(w["score"]) == np.isfinite(g["score"])
        if np.isfinite(w["score"]):
            assert abs(g["score"] - w["score"]) < 1e-3 * max(1, abs(w["score"]))
            assert g["tids"] == w["tids"]
            assert g["words"] == w["words"]


def test_parity_random_banded():
    rng = np.random.default_rng(1)
    graphs = [_random_banded_graph(rng, int(rng.integers(8, 40)))
              for _ in range(7)]
    _parity(graphs, num_pdfs=11, seed=2)


def test_parity_multi_chunk():
    """T > 128 exercises the two-level scan (emissions per time-chunk)."""
    rng = np.random.default_rng(8)
    graphs = [_random_banded_graph(rng, 120) for _ in range(3)]
    _parity(graphs, num_pdfs=11, seed=9, t=300)


def test_parity_real_training_graphs():
    """Real compiled training graphs from the synthetic Yes-No pipeline
    (with optional silences: cycles inside the silence HMM, alternative
    paths) must be banded-friendly and exactly match the generic kernel."""
    import importlib
    ge = importlib.import_module("__graft_entry__")
    lang, tree, tm, am, hclg, compiler = ge._tiny_pipeline()
    yes, no = lang.words.id("YES"), lang.words.id("NO")
    transcripts = [[yes, no, yes], [no] * 4, [yes], [no, yes, no, yes]]
    fsts = compiler.compile_batch(transcripts)
    graphs = [V.compile_dense_graph(f, tm.tid2pdf) for f in fsts]
    plan = AB.build_band_plan(graphs)
    assert plan is not None, "real training graphs should be banded"
    _parity(graphs, num_pdfs=tree.num_pdfs, seed=3, t=41)


def test_alignment_set_uses_band():
    rng = np.random.default_rng(4)
    graphs = [_random_banded_graph(rng, 20) for _ in range(3)]
    aset = AlignmentSet(graphs)
    assert aset.band is not None
    t, p = 16, 11
    ll = rng.standard_normal((3, t, p)).astype(np.float32)
    nf = np.asarray([16, 12, 9], np.int32)
    got = aset.align(ll, nf, acoustic_scale=0.5)
    want = _align_generic(graphs, ll, nf, acoustic_scale=0.5)
    for g, w in zip(got, want):
        assert g["tids"] == w["tids"]
    # a tight beam must route to the generic (pruned) kernel
    pruned = aset.align(ll, nf, acoustic_scale=0.5, beam=4.0)
    assert len(pruned) == 3


def test_align_feats_banded_matches_generic():
    import jax.numpy as jnp
    from voicebridge_tpu.models.gmm import AmDiagGmm
    from voicebridge_tpu.ops import gmm_kernels as K

    rng = np.random.default_rng(5)
    num_pdfs, dim = 11, 6
    am = AmDiagGmm(
        rng.standard_normal((num_pdfs, 2, dim)).astype(np.float32),
        np.abs(rng.standard_normal((num_pdfs, 2, dim))).astype(np.float32) + 0.5,
        np.full((num_pdfs, 2), 0.5, np.float32))
    params = K.pack_gmm(am)
    graphs = [_random_banded_graph(rng, int(rng.integers(10, 30)),
                                   num_pdfs=num_pdfs) for _ in range(5)]
    b, t = len(graphs), 24
    feats = rng.standard_normal((b, t, dim)).astype(np.float32)
    nf = rng.integers(12, t + 1, size=b).astype(np.int32)

    aset = AlignmentSet(graphs)
    got = aset.align_feats(params, feats, nf, acoustic_scale=0.3)
    ll = np.zeros((b, t, num_pdfs), np.float32)
    for i in range(b):
        ll[i] = np.asarray(K.loglikes_batch(params, jnp.asarray(feats[i:i + 1])))[0]
    want = _align_generic(graphs, ll, nf, acoustic_scale=0.3)
    for g, w in zip(got, want):
        assert g["tids"] == w["tids"]
        assert abs(g["score"] - w["score"]) < 1e-2


def test_non_dst_pure_falls_back():
    rng = np.random.default_rng(6)
    g = _random_banded_graph(rng, 12)
    pdf = g.arc_pdf.copy()
    pdf[1] = (pdf[1] + 1) % 11  # break dst-purity
    g = g._replace(arc_pdf=pdf)
    assert AB.build_band_plan([g]) is None
    aset = AlignmentSet([g])
    assert aset.band is None
    ll = rng.standard_normal((1, 10, 11)).astype(np.float32)
    res = aset.align(ll, np.asarray([10], np.int32), acoustic_scale=0.5)
    assert len(res) == 1 and len(res[0]["tids"]) == 10
