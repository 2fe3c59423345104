"""Lattice generation and lattice algebra.

Brute-force oracle on a tiny graph: enumerating every complete path verifies
the lattice-beam invariant (an arc instance survives iff the best complete
path through it is within lattice_beam of the global best — the semantics of
Kaldi's forward-link pruning, decoder/lattice-faster-decoder.cc), best-path
equivalence, exact posteriors, and word-unique N-best.  Then a small
end-to-end pipeline check wires lattices through scoring/rescoring.
"""

import itertools

import numpy as np
import pytest

import jax.numpy as jnp

from voicebridge_tpu.fst.core import Fst
from voicebridge_tpu.lat import (build_lattices, lattice_best_path,
                                 lattice_depth_per_frame, lattice_mbr,
                                 lattice_nbest, lattice_to_post,
                                 rescore_lattice_acoustics)
from voicebridge_tpu.ops import lattice as LAT
from voicebridge_tpu.ops import viterbi as V


def tiny_graph(seed=0):
    """Small cyclic 'HCLG': ilabels are tids 1..4, olabels words 0/1/2."""
    rng = np.random.default_rng(seed)
    f = Fst()
    f.add_states(4)
    f.set_start(0)
    f.set_final(2, 0.4)
    f.set_final(3, 0.1)
    arcs = [
        (0, 1, 1, 0.5, 1), (0, 2, 0, 1.0, 2), (1, 3, 2, 0.3, 1),
        (1, 1, 0, 0.2, 2), (2, 4, 0, 0.6, 3), (2, 2, 1, 0.8, 0),
        (3, 3, 2, 0.4, 2), (3, 1, 0, 0.9, 3),
    ]
    for s, il, ol, w, ns in arcs:
        f.add_arc(s, il, ol, w, ns)
    tid2pdf = np.asarray([0, 0, 1, 2, 1], np.int32)  # tid -> pdf
    return f, tid2pdf


def enumerate_paths(g: V.DenseGraph, t_total: int, ll: np.ndarray, acwt: float):
    """All complete paths of length t_total: (score, arcs, words)."""
    by_src = {}
    for a in range(g.num_arcs):
        by_src.setdefault(int(g.arc_src[a]), []).append(a)
    paths = []

    def rec(s, t, score, arcs):
        if t == t_total:
            if g.final_score[s] > V.NEG_INF / 2:
                words = list(g.oseqs[g.start_oseq[int(g.arc_src[arcs[0]])]]) \
                    if arcs else list(g.oseqs[g.start_oseq[s]])
                for a in arcs:
                    words.extend(g.oseqs[g.arc_oseq[a]])
                words.extend(g.oseqs[g.final_oseq[s]])
                paths.append((score + float(g.final_score[s]), tuple(arcs),
                              tuple(words)))
            return
        for a in by_src.get(s, []):
            rec(int(g.arc_dst[a]), t + 1,
                score + float(g.arc_score[a]) +
                acwt * float(ll[t, g.arc_pdf[a]]), arcs + [a])

    for s in range(g.num_states):
        if g.alpha0[s] > V.NEG_INF / 2:
            rec(s, 0, float(g.alpha0[s]), [])
    return paths


@pytest.fixture(scope="module")
def tiny():
    f, tid2pdf = tiny_graph()
    g = V.compile_dense_graph(f, tid2pdf)
    levels = V.build_reduction_plan(g.arc_dst, g.num_states, k=4).levels
    rev = LAT.build_src_plan(g, k=4)
    rng = np.random.default_rng(42)
    t, p = 7, 3
    ll = rng.normal(size=(2, t, p)).astype(np.float32) * 2.0
    nf = np.asarray([t, t - 2], np.int32)
    acwt = 1.0
    lbeam = 4.0
    mask, best, aend, use_final = LAT.lattice_forward_backward(
        g, levels, rev, jnp.asarray(ll), nf, acoustic_scale=acwt,
        beam=1e9, lattice_beam=lbeam, max_active=0, window=4)
    lats = build_lattices(g, mask, ll, nf, use_final)
    return dict(g=g, ll=ll, nf=nf, lats=lats, best=best, lbeam=lbeam,
                acwt=acwt)


class TestLatticeBruteForce:
    def test_beam_invariant(self, tiny):
        """Survivor set == {arc instances on complete paths within beam}."""
        g, ll, nf, lbeam = tiny["g"], tiny["ll"], tiny["nf"], tiny["lbeam"]
        for i, lat in enumerate(tiny["lats"]):
            paths = enumerate_paths(g, int(nf[i]), ll[i], tiny["acwt"])
            assert paths, "tiny graph must have complete paths"
            best = max(p[0] for p in paths)
            expect = set()
            for sc, arcs, _w in paths:
                if sc >= best - lbeam - 1e-4:
                    for t, a in enumerate(arcs):
                        expect.add((t, a))
            got = set(zip(lat.arc_t.tolist(), lat.arc_id.tolist()))
            assert got == expect
            assert abs(tiny["best"][i] - best) < 1e-3

    def test_best_path_matches_enumeration(self, tiny):
        g, ll, nf = tiny["g"], tiny["ll"], tiny["nf"]
        for i, lat in enumerate(tiny["lats"]):
            paths = enumerate_paths(g, int(nf[i]), ll[i], 1.0)
            best_sc, _arcs, best_words = max(paths, key=lambda p: p[0])
            bp = lattice_best_path(lat, lm_scale=1.0, acoustic_scale=1.0)
            assert abs(bp["score"] - best_sc) < 1e-3
            assert tuple(bp["words"]) == best_words

    def test_posteriors_match_enumeration(self, tiny):
        """Lattice FB posteriors == path-sum posteriors over surviving paths."""
        g, ll, nf = tiny["g"], tiny["ll"], tiny["nf"]
        for i, lat in enumerate(tiny["lats"]):
            arc_post, per_frame = lattice_to_post(lat, acoustic_scale=1.0,
                                                  min_post=0.0)
            # brute force restricted to the lattice's surviving arc set
            surv = set(zip(lat.arc_t.tolist(), lat.arc_id.tolist()))
            paths = [p for p in enumerate_paths(g, int(nf[i]), ll[i], 1.0)
                     if all((t, a) in surv for t, a in enumerate(p[1]))]
            scores = np.asarray([p[0] for p in paths])
            w = np.exp(scores - scores.max())
            w /= w.sum()
            expect = {}
            for wt, (sc, arcs, _) in zip(w, paths):
                for t, a in enumerate(arcs):
                    expect[(t, a)] = expect.get((t, a), 0.0) + wt
            for m in range(lat.num_arcs):
                key = (int(lat.arc_t[m]), int(lat.arc_id[m]))
                assert abs(arc_post[m] - expect.get(key, 0.0)) < 1e-4
            # per-frame posteriors sum to ~1
            for t in range(lat.nf):
                tot = sum(p for _tid, _pdf, p in per_frame[t])
                assert abs(tot - 1.0) < 1e-3

    def test_nbest_word_unique(self, tiny):
        g, ll, nf = tiny["g"], tiny["ll"], tiny["nf"]
        for i, lat in enumerate(tiny["lats"]):
            paths = enumerate_paths(g, int(nf[i]), ll[i], 1.0)
            best_by_words = {}
            for sc, _a, wd in paths:
                if wd not in best_by_words or sc > best_by_words[wd]:
                    best_by_words[wd] = sc
            ranked = sorted(best_by_words.items(), key=lambda kv: -kv[1])
            nb = lattice_nbest(lat, n=64, lm_scale=1.0, acoustic_scale=1.0)
            got = [(tuple(h["words"]), h["score"]) for h in nb]
            # every lattice nbest entry must match the oracle score for its
            # word sequence, and the top entry must be the global best
            for wd, sc in got:
                assert abs(sc - best_by_words[wd]) < 1e-3
            assert got[0][0] == ranked[0][0]

    def test_depth_and_rescore(self, tiny):
        ll = tiny["ll"]
        for i, lat in enumerate(tiny["lats"]):
            depth = lattice_depth_per_frame(lat)
            assert depth.shape[0] == lat.nf and (depth >= 1).all()
            # rescoring with the same loglikes is a no-op
            r = rescore_lattice_acoustics(lat, ll[i])
            a = lattice_best_path(lat)
            b = lattice_best_path(r)
            assert abs(a["score"] - b["score"]) < 1e-4
            # doubled acoustic evidence changes total score
            r2 = rescore_lattice_acoustics(lat, ll[i] * 2.0)
            c = lattice_best_path(r2)
            assert c["score"] != pytest.approx(a["score"])

    def test_scale_and_penalty_monotone(self, tiny):
        lat = tiny["lats"][0]
        base = lattice_best_path(lat, acoustic_scale=1.0)
        pen = lattice_best_path(lat, acoustic_scale=1.0, word_penalty=2.0)
        assert len(pen["words"]) <= len(base["words"]) or \
            pen["score"] <= base["score"]

    def test_mbr_runs(self, tiny):
        words, conf = lattice_mbr(tiny["lats"][0], n=8)
        assert all(0.0 <= c <= 1.0 + 1e-6 for c in conf)
        assert len(words) == len(conf)


class TestLatticePipeline:
    """Lattices on a trained mono system (shares the e2e fixture corpus)."""

    @pytest.fixture(scope="class")
    def sys(self):
        from test_endtoend_mono import extract_feats, _batch
        from synth import LEXICON, SR, make_corpus
        from voicebridge_tpu.config import (DecodeOptions, FrameOptions,
                                            LangOptions, MfccOptions,
                                            MonoTrainOptions)
        from voicebridge_tpu.data.lang import prepare_lang
        from voicebridge_tpu.fst.hclg import mkgraph
        from voicebridge_tpu.lm.arpa import arpa_to_fst
        from voicebridge_tpu.lm.ngram import estimate_ngram
        from voicebridge_tpu.steps.decode import Decoder
        from voicebridge_tpu.steps.train_mono import train_mono

        train, test = make_corpus(num_train=12, num_test=6, seed=3)
        opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))
        train_feats = extract_feats(train, opts)
        test_feats = extract_feats(test, opts)
        lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
        w2id = lang.words.id
        transcripts = {u: [w2id(w) for w in ws] for u, (_x, ws) in train.items()}
        model = train_mono(train_feats, transcripts, lang,
                           MonoTrainOptions(num_iters=8, totgauss=120,
                                            max_iter_inc=6,
                                            realign_iters=tuple(range(1, 8))))
        arpa = estimate_ngram([ws for (_x, ws) in train.values()], order=2)
        G = arpa_to_fst(arpa, lang.words.id, lang.word_disambig_id)
        hclg = mkgraph(lang, model.tree, model.trans_model, G)
        dec = Decoder(hclg, model.trans_model, model.am,
                      DecodeOptions(beam=1e9, lattice_beam=8.0, max_active=0))
        utts, feats, nf = _batch(test_feats)
        return dict(dec=dec, lang=lang, utts=utts, feats=feats, nf=nf,
                    test=test)

    def test_lattice_best_path_equals_decode(self, sys):
        dec, utts, feats, nf = sys["dec"], sys["utts"], sys["feats"], sys["nf"]
        acwt = dec.opts.acoustic_scale
        res = dec.decode_batch(utts, feats, nf)
        lats = dec.decode_lattice(utts, feats, nf)
        for r in res:
            bp = lattice_best_path(lats[r.utt], lm_scale=1.0,
                                   acoustic_scale=acwt)
            assert bp["words"] == r.words
            assert bp["score"] == pytest.approx(r.score, abs=1e-2)

    def test_sweep_lattice_scoring(self, sys):
        from voicebridge_tpu.steps.score import compute_wer_set, score_sweep

        dec, utts, feats, nf = sys["dec"], sys["utts"], sys["feats"], sys["nf"]
        id2w = sys["lang"].words.sym
        refs = {u: list(sys["test"][u][1]) for u in utts}
        sweep, lats = dec.decode_sweep_lattice(utts, feats, nf,
                                               lmwts=[7, 10, 13])
        hyps_by = {w: {r.utt: [id2w(x) for x in r.words] for r in rs}
                   for w, rs in sweep.items()}
        res = score_sweep(refs, hyps_by)
        assert res.best_wer.wer <= 10.0
        for u in utts:
            d = lattice_depth_per_frame(lats[u])
            assert d.shape[0] == lats[u].nf and (d >= 1).all()


class TestRowsFbParity:
    def test_rows_fb_matches_reference_fb(self, tiny):
        """The batch-minor row-based FB (production path) must produce the
        same survivor sets, totals, and use_final as the reference windowed
        FB at infinite forward beam."""
        from voicebridge_tpu.lat import build_lattices_packed

        g, ll, nf = tiny["g"], tiny["ll"], tiny["nf"]
        plan, fwd_dev, bwd_plan, bwd_dev, row_dst = LAT.build_lattice_plans(g)
        packed, best, aend, use_final = LAT.lattice_forward_backward_rows(
            g, plan, fwd_dev, bwd_plan, bwd_dev, row_dst, jnp.asarray(ll), nf,
            acoustic_scale=tiny["acwt"], lattice_beam=tiny["lbeam"],
            window=4)
        np.testing.assert_allclose(best, tiny["best"], atol=1e-3)
        lats = build_lattices_packed(g, plan.row_arc, packed, ll, nf,
                                     use_final)
        for lat_new, lat_old in zip(lats, tiny["lats"]):
            got = set(zip(lat_new.arc_t.tolist(), lat_new.arc_id.tolist()))
            want = set(zip(lat_old.arc_t.tolist(), lat_old.arc_id.tolist()))
            assert got == want
            assert lat_new.use_final == lat_old.use_final


class TestSparseMaskFetch:
    def test_sparse_matches_packed(self, tiny):
        """Bounded-budget sparse survivor fetch must reproduce the dense
        packed-mask lattices exactly when the budget is not exceeded."""
        from voicebridge_tpu.lat import (build_lattices_packed,
                                         build_lattices_sparse)
        from voicebridge_tpu.ops.decode_core import (build_emit_plan,
                                                     plan_to_device)

        g, ll_np, acwt = tiny["g"], tiny["ll"], tiny["acwt"]
        plan, fwd_dev, bwd_plan, bwd_dev, row_dst = LAT.build_lattice_plans(g)
        ll = jnp.asarray(ll_np)
        nf = tiny["nf"]
        nbytes = -(-plan.num_rows * plan.d // 8)
        packed, _b1, _a1, uf1 = LAT.lattice_forward_backward_rows(
            g, plan, fwd_dev, bwd_plan, bwd_dev, row_dst, ll, nf,
            acoustic_scale=acwt, lattice_beam=5.0, window=4)
        dense = build_lattices_packed(g, plan.row_arc, packed,
                                      ll_np, nf, uf1)
        sparse, _b2, _a2, uf2 = LAT.lattice_forward_backward_rows(
            g, plan, fwd_dev, bwd_plan, bwd_dev, row_dst, ll, nf,
            acoustic_scale=acwt, lattice_beam=5.0, window=4,
            mask_budget=64)
        lats = build_lattices_sparse(g, plan.row_arc, sparse, nbytes,
                                     ll_np, nf, uf2)
        assert (uf1 == uf2).all()
        for a, c in zip(dense, lats):
            np.testing.assert_array_equal(a.arc_t, c.arc_t)
            np.testing.assert_array_equal(a.arc_id, c.arc_id)
            np.testing.assert_allclose(a.acoustic_cost, c.acoustic_cost,
                                       atol=1e-5)

    def test_tiered_tail_fetch_matches_dense(self):
        """mask_budget > window*128 with dense survivor masks drives
        count.max() past the eagerly-fetched k1 prefix, exercising the lazy
        bucketed tail slice in _finish_fetch (round-4 advisor finding: all
        prior sparse tests had k1 == K, leaving that branch dead in CI)."""
        from voicebridge_tpu.lat import (build_lattices_packed,
                                         build_lattices_sparse)

        rng = np.random.default_rng(5)
        s, aps, p = 1500, 4, 16
        arc_src = np.repeat(np.arange(s, dtype=np.int32), aps)
        arc_dst = ((arc_src + rng.integers(1, 9, s * aps)) % s).astype(np.int32)
        arc_dst[::aps] = arc_src[::aps]  # self-loops
        pdf_state = rng.integers(0, p, s).astype(np.int32)
        # every state initial: the whole graph is alpha-reachable from frame
        # 0, so the huge lattice beam keeps ~every arc alive every frame
        alpha0 = np.zeros(s, np.float32)
        g = V.DenseGraph(
            num_states=s, arc_src=arc_src, arc_dst=arc_dst,
            arc_tid=pdf_state[arc_dst], arc_pdf=pdf_state[arc_dst],
            arc_score=(-rng.exponential(0.5, s * aps)).astype(np.float32),
            arc_oseq=np.zeros(s * aps, np.int32), alpha0=alpha0,
            start_oseq=np.zeros(s, np.int32),
            final_score=np.zeros(s, np.float32),
            final_oseq=np.zeros(s, np.int32), oseqs=[()])
        plan, fwd_dev, bwd_plan, bwd_dev, row_dst = LAT.build_lattice_plans(g)
        nbytes = -(-plan.num_rows * plan.d // 8)
        t = 8
        window = 4
        ll = rng.normal(size=(2, t, p)).astype(np.float32) * 0.1
        nf = np.asarray([t, t], np.int32)
        # huge lattice beam -> nearly every reachable arc survives: nonzero
        # words per window far exceed k1 = window*128 = 512
        kw = dict(acoustic_scale=1.0, lattice_beam=1e6, window=window)
        packed, _b, _a, uf = LAT.lattice_forward_backward_rows(
            g, plan, fwd_dev, bwd_plan, bwd_dev, row_dst, jnp.asarray(ll),
            nf, **kw)
        dense = build_lattices_packed(g, plan.row_arc, packed, ll, nf, uf)
        budget = window * 4096  # k1 = 512 < K = 16384
        sparse, _b2, _a2, uf2 = LAT.lattice_forward_backward_rows(
            g, plan, fwd_dev, bwd_plan, bwd_dev, row_dst, jnp.asarray(ll),
            nf, mask_budget=budget, **kw)
        counts = np.stack([c for (_t0, _i, _v, c) in sparse])
        assert counts.max() > window * 128, \
            "test must overflow the k1 prefix to cover the tail branch"
        assert counts.max() <= budget, "budget must hold (no clipping)"
        clips = []
        lats = build_lattices_sparse(g, plan.row_arc, sparse, nbytes, ll, nf,
                                     uf2, log_warn=lambda *a: clips.append(a))
        assert not clips
        for a, c in zip(dense, lats):
            np.testing.assert_array_equal(a.arc_t, c.arc_t)
            np.testing.assert_array_equal(a.arc_id, c.arc_id)

    def test_sparsify_hierarchical_matches_flat(self):
        """The two-level block/word compaction (large-M path) must agree
        with the flat sort exactly when nonzero words fit the block budget,
        and must signal count > budget when they spread over more blocks
        than the level-1 sort can keep."""
        rng = np.random.default_rng(11)
        mbytes, b = 40000, 3  # mw = 10000 words > 4096 -> hierarchical
        flat = np.zeros((mbytes, b), np.uint8)
        # cluster nonzero bytes into 10 block-regions (well under kb)
        for bi in range(b):
            for blk in rng.choice(70, size=10, replace=False):
                lo = blk * 128  # one 32-word block = 128 bytes
                pos = lo + rng.choice(128, size=12, replace=False)
                flat[pos, bi] = rng.integers(1, 255, size=12)
        budget = 512  # kb = 16 blocks
        hi_i, hi_v, hi_c, hi_nz = LAT._sparsify_words(jnp.asarray(flat),
                                                      budget)
        fl_i, fl_v, fl_c, _ = LAT._sparsify_words(jnp.asarray(flat), 16384)
        hi_i, hi_v, hi_c = map(np.asarray, (hi_i, hi_v, hi_c))
        fl_i, fl_v, fl_c = map(np.asarray, (fl_i, fl_v, fl_c))
        # the nonzero-word bitmap (dense-window fetch encoding) must agree
        # with the exact idx list
        bits = np.unpackbits(np.asarray(hi_nz), axis=0)
        for bi in range(b):
            np.testing.assert_array_equal(
                np.flatnonzero(bits[:, bi]),
                np.sort(fl_i[:int(fl_c[bi]), bi]))
        np.testing.assert_array_equal(hi_c, fl_c)
        for bi in range(b):
            c = int(fl_c[bi])
            assert 0 < c <= budget
            np.testing.assert_array_equal(hi_i[:c, bi], fl_i[:c, bi])
            np.testing.assert_array_equal(hi_v[:c, bi], fl_v[:c, bi])
        # adversarial spread: 1 nonzero byte in each of 64 distinct blocks
        # > kb=16 -> the lax.cond fallback must route to the exact flat
        # sort (worst-case lattice densities spread like this; round-5
        # measured ~10k of 13k blocks active at lattice_beam 8)
        flat2 = np.zeros((mbytes, b), np.uint8)
        flat2[np.arange(64) * 128 + 5, :] = 7
        s_i, s_v, s_c, _ = map(np.asarray,
                               LAT._sparsify_words(jnp.asarray(flat2),
                                                   budget))
        f_i, f_v, f_c, _ = map(np.asarray,
                               LAT._sparsify_words(jnp.asarray(flat2),
                                                   16384))
        np.testing.assert_array_equal(s_c, f_c)
        assert (s_c == 64).all()
        for bi in range(b):
            np.testing.assert_array_equal(s_i[:64, bi], f_i[:64, bi])
            np.testing.assert_array_equal(s_v[:64, bi], f_v[:64, bi])

    def test_budget_overflow_clips_and_warns(self, tiny):
        """count > budget reports the clip and keeps the first K bytes."""
        from voicebridge_tpu.lat import build_lattices_sparse

        g, ll_np, acwt = tiny["g"], tiny["ll"], tiny["acwt"]
        plan, fwd_dev, bwd_plan, bwd_dev, row_dst = LAT.build_lattice_plans(g)
        nbytes = -(-plan.num_rows * plan.d // 8)
        sparse, _b, _a, uf = LAT.lattice_forward_backward_rows(
            g, plan, fwd_dev, bwd_plan, bwd_dev, row_dst, jnp.asarray(ll_np),
            tiny["nf"], acoustic_scale=acwt, lattice_beam=1e6, window=4,
            mask_budget=1)  # absurd beam + tiny budget forces overflow
        clips = []
        lats = build_lattices_sparse(
            g, plan.row_arc, sparse, nbytes, ll_np, tiny["nf"], uf,
            log_warn=lambda *a: clips.append(a))
        assert clips, "expected at least one clipped window"
        assert all(l.num_arcs >= 0 for l in lats)
