"""Mesh-parallel correctness: the sharded EM E-step must produce identical
statistics on any mesh shape (1, 2, 4, 8 devices) — the scale-out guarantee
the reference never had (SURVEY.md §4 implication iv)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.ops import gmm_kernels as K
from voicebridge_tpu.ops import viterbi as V
from voicebridge_tpu.parallel import mesh as M


@pytest.fixture(scope="module")
def setup():
    """Tiny model + per-utterance graphs + aligned batch, host-side."""
    from voicebridge_tpu.config import LangOptions
    from voicebridge_tpu.data.lang import prepare_lang
    from voicebridge_tpu.fst.hclg import TrainingGraphCompiler
    from voicebridge_tpu.models.transition import TransitionModel
    from voicebridge_tpu.steps.align import equal_align
    from voicebridge_tpu.steps.train_mono import make_mono_tree

    lex = {"YES": [(1.0, ("Y", "EH", "S"))], "NO": [(1.0, ("N", "OW"))]}
    lang = prepare_lang(lex, ["SIL"], "SIL", LangOptions())
    tree = make_mono_tree(lang)
    tm = TransitionModel(lang.topo, tree)
    rng = np.random.default_rng(0)
    dim = 12
    am = AmDiagGmm.flat_start(tree.num_pdfs, rng.standard_normal(dim),
                              np.ones(dim))
    b, t = 8, 24
    transcripts = [[lang.words.id("YES")], [lang.words.id("NO")]] * (b // 2)
    compiler = TrainingGraphCompiler(lang, tree, tm)
    graphs = [V.compile_dense_graph(f, tm.tid2pdf)
              for f in compiler.compile_batch(transcripts)]
    padded = V.pad_graphs(graphs)
    feats = rng.standard_normal((b, t, dim)).astype(np.float32)
    nf = np.full(b, t, np.int32)
    tids = np.zeros((b, t), np.int32)
    weights = np.ones((b, t), np.float32)
    for i, g in enumerate(graphs):
        fr = equal_align(g, t, seed=i)
        tids[i] = g.arc_tid[fr]
    pdf_ids = tm.tid2pdf[tids].astype(np.int32)
    return dict(am=am, tm=tm, tree=tree, padded=padded, graphs=graphs,
                feats=feats, nf=nf, tids=tids, pdf_ids=pdf_ids,
                weights=weights)


def run_estep(setup, n_dev):
    mesh = M.make_mesh(num_data=n_dev)
    p = setup["padded"]
    params = M.replicate(mesh, K.pack_gmm(setup["am"]))
    gb = M.shard_batch(mesh, dict(arc_src=p["arc_src"], levels=p["levels"],
                                  arc_pdf=p["arc_pdf"], arc_score=p["arc_score"],
                                  alpha0=p["alpha0"]))
    data = M.shard_batch(mesh, dict(feats=setup["feats"], nf=setup["nf"],
                                    tids=setup["tids"],
                                    pdf_ids=setup["pdf_ids"],
                                    weights=setup["weights"]))
    step = M.em_estep_sharded(mesh, p["num_states"], setup["tree"].num_pdfs,
                              setup["tm"].num_transition_ids)
    alpha_end, bps, occ, macc, vacc, tstats, ll = step(
        params, gb["arc_src"], gb["levels"], gb["arc_pdf"], gb["arc_score"],
        gb["alpha0"], data["feats"], data["nf"], data["tids"],
        data["pdf_ids"], data["weights"], jnp.float32(0.1))
    return (np.asarray(occ), np.asarray(macc), np.asarray(tstats), float(ll),
            np.asarray(alpha_end))


class TestMeshConsistency:
    def test_same_stats_across_mesh_shapes(self, setup):
        results = {n: run_estep(setup, n) for n in (1, 2, 4, 8)}
        ref = results[1]
        for n in (2, 4, 8):
            occ, macc, tstats, ll, alpha = results[n]
            np.testing.assert_allclose(occ, ref[0], rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(macc, ref[1], rtol=1e-4, atol=1e-3)
            np.testing.assert_allclose(tstats, ref[2], rtol=1e-5, atol=1e-4)
            assert abs(ll - ref[3]) < 1e-2 * max(abs(ref[3]), 1)
            np.testing.assert_allclose(alpha, ref[4], rtol=1e-4, atol=1e-3)

    def test_banded_estep_matches_generic_across_meshes(self, setup):
        """The banded sharded E-step (production alignment kernel) must
        produce the same psum-reduced stats as the generic one, on every
        mesh shape, and its alpha_end must be the generic alpha_end under
        the band plan's state permutation."""
        from voicebridge_tpu.ops import align_band as AB

        band = AB.build_band_plan(setup["graphs"])
        assert band is not None
        ref = run_estep(setup, 1)

        for n in (1, 2, 4):
            mesh = M.make_mesh(num_data=n)
            params = M.replicate(mesh, K.pack_gmm(setup["am"]))
            bb = M.shard_batch(mesh, dict(W=band.W, pdf=band.pdf,
                                          alpha0=band.alpha0))
            data = M.shard_batch(mesh, dict(
                feats=setup["feats"], nf=setup["nf"], tids=setup["tids"],
                pdf_ids=setup["pdf_ids"], weights=setup["weights"]))
            step = M.em_estep_sharded_banded(
                mesh, setup["tree"].num_pdfs,
                setup["tm"].num_transition_ids, band.offsets)
            alpha_end, bps, occ, macc, vacc, tstats, ll = step(
                params, bb["W"], bb["pdf"], bb["alpha0"], data["feats"],
                data["nf"], data["tids"], data["pdf_ids"], data["weights"],
                jnp.float32(0.1))
            np.testing.assert_allclose(np.asarray(occ), ref[0],
                                       rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(np.asarray(tstats), ref[2],
                                       rtol=1e-5, atol=1e-4)
            assert abs(float(ll) - ref[3]) < 1e-2 * max(abs(ref[3]), 1)
            # alpha_end parity under the per-graph state permutation
            a = np.asarray(alpha_end)
            for i, g in enumerate(setup["graphs"]):
                n2o = band.n2o[i, : g.num_states]
                np.testing.assert_allclose(
                    a[i, : g.num_states], ref[4][i, n2o],
                    rtol=1e-4, atol=1e-3)

    def test_alignment_forward_matches_unsharded(self, setup):
        p = setup["padded"]
        ll_frames = K.loglikes_batch(K.pack_gmm(setup["am"]),
                                     jnp.asarray(setup["feats"]))
        alpha_end, _ = V.viterbi_forward_batched(
            p["arc_src"], p["levels"], p["arc_pdf"], p["arc_score"],
            p["alpha0"], ll_frames, jnp.asarray(setup["nf"]),
            np.float32(0.1), np.float32(1e9), p["num_states"])
        _, _, _, _, alpha_sharded = run_estep(setup, 4)
        np.testing.assert_allclose(np.asarray(alpha_end), alpha_sharded,
                                   rtol=1e-4, atol=1e-3)


class TestShardedAccumulators:
    """SURVEY §2.6 P2 completion: LDA / MLLT / fMLLR / tree-stats
    accumulation sharded over the data axis must be invariant to the mesh
    shape and must match the unsharded production wrappers exactly —
    the reference's per-job acc-file reductions
    (train_lda_mllt.cpp:305-376, train_sat.cpp:906-954,
    train_deltas.cpp:294) as collectives."""

    def test_lda_stats_mesh_invariant(self, setup):
        from voicebridge_tpu.transforms.lda import acc_lda_stats

        b, t, d = setup["feats"].shape
        feats = setup["feats"].reshape(b * t, d)
        pdfs = setup["pdf_ids"].reshape(-1)
        w = setup["weights"].reshape(-1).copy()
        w[::7] = 0.25  # non-trivial weights
        num_pdfs = setup["tree"].num_pdfs
        ref = [np.asarray(x) for x in acc_lda_stats(
            jnp.asarray(feats), jnp.asarray(pdfs), jnp.asarray(w), num_pdfs)]
        for n in (1, 2, 4, 8):
            mesh = M.make_mesh(num_data=n)
            got = acc_lda_stats(feats, pdfs, w, num_pdfs, mesh=mesh)
            for r, g in zip(ref, got):
                np.testing.assert_allclose(np.asarray(g), r,
                                           rtol=1e-5, atol=1e-4)

    def test_mllt_stats_mesh_invariant(self, setup):
        from voicebridge_tpu.transforms.mllt import acc_mllt_stats

        am = setup["am"]
        params = K.pack_gmm(am)
        b, t, d = setup["feats"].shape
        feats = setup["feats"].reshape(b * t, d)
        pdfs = setup["pdf_ids"].reshape(-1)
        w = setup["weights"].reshape(-1)
        g_ref, beta_ref = acc_mllt_stats(
            params, jnp.asarray(am.means()), jnp.asarray(am.inv_vars),
            feats, pdfs, w)
        for n in (1, 2, 4, 8):
            mesh = M.make_mesh(num_data=n)
            g_m, beta_m = acc_mllt_stats(
                params, jnp.asarray(am.means()), jnp.asarray(am.inv_vars),
                feats, pdfs, w, mesh=mesh)
            np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-3)
            assert abs(beta_m - beta_ref) < 1e-3 * max(abs(beta_ref), 1)

    def test_fmllr_stats_mesh_invariant(self, setup):
        from voicebridge_tpu.transforms.fmllr import acc_fmllr_stats

        am = setup["am"]
        params = K.pack_gmm(am)
        b, t, d = setup["feats"].shape
        feats = setup["feats"].reshape(b * t, d)
        pdfs = setup["pdf_ids"].reshape(-1)
        w = setup["weights"].reshape(-1)
        num_spk = 3
        spk = np.repeat(np.arange(b, dtype=np.int32) % num_spk, t)
        ref = [np.asarray(x) for x in acc_fmllr_stats(
            params, jnp.asarray(am.means()), jnp.asarray(am.inv_vars),
            feats, pdfs, w, spk, num_spk)]
        for n in (1, 2, 4, 8):
            mesh = M.make_mesh(num_data=n)
            got = acc_fmllr_stats(
                params, jnp.asarray(am.means()), jnp.asarray(am.inv_vars),
                feats, pdfs, w, spk, num_spk, mesh=mesh)
            for r, g in zip(ref, got):
                np.testing.assert_allclose(np.asarray(g), r,
                                           rtol=1e-4, atol=1e-3)

    def test_tree_stats_mesh_invariant(self, setup):
        from voicebridge_tpu.models.treebuild import acc_tree_stats

        tm = setup["tm"]
        b, t, d = setup["feats"].shape
        feats_by_utt = {f"u{i}": setup["feats"][i] for i in range(b)}
        alis = {f"u{i}": list(setup["tids"][i]) for i in range(b)}
        ref = acc_tree_stats(alis, feats_by_utt, tm)
        assert ref, "expected nonempty tree stats"
        for n in (1, 2, 4, 8):
            mesh = M.make_mesh(num_data=n)
            got = acc_tree_stats(alis, feats_by_utt, tm, mesh=mesh)
            assert set(got) == set(ref)
            for key, st in ref.items():
                np.testing.assert_allclose(got[key].count, st.count,
                                           rtol=1e-6, atol=1e-4)
                np.testing.assert_allclose(got[key].sum_x, st.sum_x,
                                           rtol=1e-5, atol=1e-3)
                np.testing.assert_allclose(got[key].sum_x2, st.sum_x2,
                                           rtol=1e-5, atol=1e-3)


class TestInputPipeline:
    def test_bucketing_bounds_padding(self, tmp_path):
        from voicebridge_tpu.parallel.data import bucket_by_length

        rng = np.random.default_rng(0)
        nf = {f"u{i:03d}": int(rng.integers(50, 1000)) for i in range(200)}
        batches = bucket_by_length(nf, batch_size=16, max_pad_ratio=0.2)
        seen = [u for utts, _t in batches for u in utts]
        assert sorted(seen) == sorted(nf)  # partition, no dup/loss
        for utts, t_pad in batches:
            assert len(utts) <= 16
            assert t_pad == max(nf[u] for u in utts)
            waste = sum(t_pad - nf[u] for u in utts)
            assert waste <= 0.2 * t_pad * len(utts) + t_pad  # bounded

    def test_stream_batches_roundtrip(self, tmp_path):
        from voicebridge_tpu.parallel.data import stream_batches
        from voicebridge_tpu.utils.io import write_archive

        rng = np.random.default_rng(1)
        data = {f"u{i}": rng.standard_normal((int(rng.integers(5, 40)), 13)
                                             ).astype(np.float32)
                for i in range(30)}
        arc = write_archive(tmp_path / "f", data)
        nf = {u: v.shape[0] for u, v in data.items()}
        seen = set()
        for utts, feats, nfs in stream_batches(arc, nf, batch_size=8,
                                               pad_multiple=4):
            assert feats.shape[0] % 4 == 0
            for i, u in enumerate(utts):
                np.testing.assert_array_equal(feats[i, : nfs[i]], data[u])
                assert (feats[i, nfs[i]:] == 0).all()
                seen.add(u)
        assert seen == set(data)
