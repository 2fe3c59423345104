"""Decode jit-cache stability: repeated decodes with different raw lengths
must NOT recompile (VERDICT r1 weak #2/#8 — per-batch window/shape
recompiles).  Probes the jitted functions' cache sizes directly.
"""

import numpy as np
import jax.numpy as jnp

from voicebridge_tpu.ops import decode_core as DC
from voicebridge_tpu.steps.decode import Decoder
from tests.test_decode_core import random_dense_graph


def test_decode_best_path_no_recompile_across_lengths():
    rng = np.random.default_rng(0)
    g = random_dense_graph(rng, s=30, a=150)
    plan = DC.build_emit_plan(g, d=4, k_upper=3)
    dev = DC.plan_to_device(plan)
    b, p, chunk = 2, 7, 8

    def run(t):
        ll = jnp.asarray(rng.standard_normal((b, t, p)), jnp.float32)
        nf = np.array([t, max(1, t - 3)], np.int32)
        return DC.decode_best_path(g, plan, dev, ll, nf, 0.7, chunk=chunk)

    run(23)  # warm (pads to 24 = 3 chunks of 8)
    scan0 = DC.viterbi_scan._cache_size()
    bt0 = DC.backtrace_scan._cache_size()
    run(17)  # pads to 24 as well: same compiled programs
    run(20)
    assert DC.viterbi_scan._cache_size() == scan0, \
        "varying T recompiled the forward scan"
    assert DC.backtrace_scan._cache_size() == bt0, \
        "varying T recompiled the backtrace"


def test_bucket_shapes():
    f = np.zeros((5, 130, 13), np.float32)
    nf = np.array([130, 100, 90, 10, 1])
    padded, nf2, b = Decoder._bucket(f, nf)
    assert padded.shape == (8, 256, 13)
    assert b == 5 and list(nf2[:5]) == list(nf) and all(nf2[5:] == 0)
    # already-bucketed input passes through untouched
    f2 = np.zeros((8, 256, 13), np.float32)
    p2, _, _ = Decoder._bucket(f2, np.full(8, 256))
    assert p2 is f2


def _tiny_decoder(opts=None):
    from voicebridge_tpu.config import DecodeOptions, LangOptions
    from voicebridge_tpu.data.lang import prepare_lang
    from voicebridge_tpu.fst.hclg import mkgraph
    from voicebridge_tpu.lm.arpa import arpa_to_fst
    from voicebridge_tpu.lm.ngram import estimate_ngram
    from voicebridge_tpu.models.gmm import AmDiagGmm
    from voicebridge_tpu.models.transition import TransitionModel
    from voicebridge_tpu.steps.train_mono import make_mono_tree

    lex = {"YES": [(1.0, ("Y", "EH", "S"))], "NO": [(1.0, ("N", "OW"))]}
    lang = prepare_lang(lex, ["SIL"], "SIL", LangOptions())
    tree = make_mono_tree(lang)
    tm = TransitionModel(lang.topo, tree)
    arpa = estimate_ngram([["YES"], ["NO"], ["YES", "NO"]], order=2)
    hclg = mkgraph(lang, tree, tm, arpa_to_fst(arpa, lang.words.id,
                                               lang.word_disambig_id))
    rng = np.random.default_rng(0)
    p, m, d = tree.num_pdfs, 2, 13
    am = AmDiagGmm(rng.standard_normal((p, m, d)).astype(np.float32),
                   (np.abs(rng.standard_normal((p, m, d))) + 0.5).astype(
                       np.float32),
                   np.full((p, m), 1.0 / m, np.float32))
    return Decoder(hclg, tm, am,
                   opts or DecodeOptions(lattice_beam=6.0)), d


def test_lattice_window_model():
    # W ~ sqrt(T) rounded to a power of two, clamped to [16, 64]
    assert Decoder._lattice_window(100) == 16
    assert Decoder._lattice_window(256) == 16
    assert Decoder._lattice_window(1000) == 32
    assert Decoder._lattice_window(3000) == 64
    assert Decoder._lattice_window(10) == 16
    assert Decoder._lattice_window(100000) == 64


def test_decode_lattice_no_recompile_across_lengths():
    """The lattice path's window programs must stay jit-cache-warm across
    batches of different raw T and B (VERDICT r2 weak #3)."""
    from voicebridge_tpu.ops import lattice as LAT

    dec, dim = _tiny_decoder()
    rng = np.random.default_rng(1)

    def run(b, t):
        feats = rng.standard_normal((b, t, dim)).astype(np.float32)
        nf = np.full(b, t, np.int32)
        nf[-1] = max(1, t - 7)
        lats = dec.decode_lattice([f"u{i}" for i in range(b)], feats, nf)
        assert len(lats) == b

    run(3, 100)  # warm: T buckets to 128, window 16
    f0 = LAT._fb_win_forward._cache_size()
    b0 = LAT._fb_win_backward._cache_size()
    assert f0 > 0 and b0 > 0
    run(3, 120)
    run(2, 90)
    assert LAT._fb_win_forward._cache_size() == f0, \
        "varying T/B recompiled the lattice forward window"
    assert LAT._fb_win_backward._cache_size() == b0, \
        "varying T/B recompiled the lattice backward window"


def test_lattice_mem_budget_chunks_invariant():
    """lattice_mem_budget only changes the sub-batch size, never the
    lattices: a tiny budget (b_chunk=2 floor) must reproduce the default
    budget's arcs exactly."""
    from voicebridge_tpu.config import DecodeOptions

    dec, dim = _tiny_decoder()
    small, _ = _tiny_decoder(
        DecodeOptions(lattice_beam=6.0, lattice_mem_budget=1.0))
    rng = np.random.default_rng(3)
    b, t = 5, 100
    feats = rng.standard_normal((b, t, dim)).astype(np.float32)
    nf = np.full(b, t, np.int32)
    utts = [f"u{i}" for i in range(b)]
    a = dec.decode_lattice(utts, feats, nf)
    c = small.decode_lattice(utts, feats, nf)
    for u in utts:
        np.testing.assert_array_equal(a[u].arc_t, c[u].arc_t)
        np.testing.assert_array_equal(a[u].arc_id, c[u].arc_id)
