"""Unit tests for LDA / MLLT / fMLLR estimation (reference test strategy:
fmllr-diag-gmm-test.cc checks the estimated transform improves the objective)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax

from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.ops import gmm_kernels as K
from voicebridge_tpu.transforms.fmllr import (acc_fmllr_stats,
                                              estimate_fmllr_batch)
from voicebridge_tpu.transforms.lda import (acc_lda_stats,
                                            apply_affine_transform,
                                            estimate_lda)
from voicebridge_tpu.transforms.mllt import (acc_mllt_stats,
                                             compose_transforms, est_mllt,
                                             transform_model_means)

RNG = np.random.default_rng(5)


def random_gmm(num_pdfs=6, mix=2, dim=8, spread=4.0):
    means = RNG.standard_normal((num_pdfs, mix, dim)) * spread
    variances = 0.5 + RNG.random((num_pdfs, mix, dim))
    w = RNG.random((num_pdfs, mix)) + 0.2
    w /= w.sum(axis=1, keepdims=True)
    return AmDiagGmm((means / variances).astype(np.float32),
                     (1.0 / variances).astype(np.float32),
                     w.astype(np.float32))


def sample_frames(am, n):
    p = RNG.integers(0, am.num_pdfs, n)
    x = np.zeros((n, am.dim), np.float32)
    means, variances = am.means(), am.variances()
    for i in range(n):
        m = RNG.choice(am.max_mix, p=am.weights[p[i]] / am.weights[p[i]].sum())
        x[i] = means[p[i], m] + RNG.standard_normal(am.dim) * np.sqrt(variances[p[i], m])
    return x, p.astype(np.int32)


class TestLda:
    def test_lda_separates_classes(self):
        # 3 well-separated classes in 10-d, discriminative subspace = dims 0,1
        n, d = 600, 10
        centers = np.zeros((3, d))
        centers[0, 0], centers[1, 0], centers[2, 1] = 8, -8, 8
        cls = RNG.integers(0, 3, n)
        x = (centers[cls] + RNG.standard_normal((n, d))).astype(np.float32)
        counts, macc, scat = acc_lda_stats(jnp.asarray(x), jnp.asarray(cls),
                                           jnp.ones(n, np.float32), 3)
        mat = estimate_lda(np.asarray(counts), np.asarray(macc),
                           np.asarray(scat), dim_out=2)
        assert mat.shape == (2, d + 1)
        y = np.asarray(apply_affine_transform(jnp.asarray(x), mat))
        # projected class means should be well separated vs within-class std
        proj_means = np.stack([y[cls == c].mean(axis=0) for c in range(3)])
        within = np.mean([y[cls == c].std(axis=0) for c in range(3)])
        sep = np.linalg.norm(proj_means[0] - proj_means[1])
        assert sep > 5 * within
        # zero-mean output
        assert np.abs(y.mean(axis=0)).max() < 1.0


class TestMllt:
    def test_mllt_improves_on_correlated_data(self):
        # data generated with correlated noise: MLLT should find a rotation
        # that improves the diagonal likelihood
        am = random_gmm(num_pdfs=4, mix=1, dim=6)
        x, p = sample_frames(am, 800)
        # correlate features
        rot = np.linalg.qr(RNG.standard_normal((6, 6)))[0].astype(np.float32)
        x_corr = x @ rot.T
        # retrain single-gauss model on correlated data (cheap M-step)
        params0 = K.pack_gmm(am)
        occ, macc, vacc = K.acc_gmm_stats(params0, jnp.asarray(x_corr),
                                          jnp.asarray(p), am.num_pdfs,
                                          jnp.ones(len(p), np.float32))
        am.mle_update(np.asarray(occ), np.asarray(macc), np.asarray(vacc),
                      min_gaussian_occupancy=1.0)
        params = K.pack_gmm(am)
        g, beta = acc_mllt_stats(params, jnp.asarray(am.means()),
                                 jnp.asarray(am.inv_vars),
                                 jnp.asarray(x_corr), jnp.asarray(p),
                                 jnp.ones(len(p), np.float32))
        m, impr = est_mllt(np.asarray(g), float(beta))
        assert impr > 0.01, f"MLLT impr {impr}"
        assert np.isfinite(m).all()

    def test_compose_transforms_shapes(self):
        lin = RNG.standard_normal((4, 4)).astype(np.float32)
        aff = RNG.standard_normal((4, 5)).astype(np.float32)
        out = compose_transforms(lin, aff)
        assert out.shape == (4, 5)
        x = RNG.standard_normal(4).astype(np.float32)
        want = lin @ (aff[:, :4] @ x + aff[:, 4])
        got = out[:, :4] @ x + out[:, 4]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_transform_means(self):
        am = random_gmm()
        m = np.linalg.qr(RNG.standard_normal((am.dim, am.dim)))[0].astype(np.float32)
        want = np.einsum("de,pme->pmd", m, am.means())
        transform_model_means(am, m)
        np.testing.assert_allclose(am.means(), want, rtol=1e-3, atol=1e-3)


class TestFmllr:
    def test_fmllr_recovers_affine_mismatch(self):
        # model trained on x; speaker features are A x + b: fMLLR should
        # approximately invert and improve the likelihood
        am = random_gmm(num_pdfs=5, mix=1, dim=5)
        x, p = sample_frames(am, 1500)
        a_true = np.eye(5) + 0.3 * RNG.standard_normal((5, 5))
        b_true = RNG.standard_normal(5)
        x_spk = (x @ a_true.T + b_true).astype(np.float32)
        params = K.pack_gmm(am)
        spk = np.zeros(len(p), np.int32)
        beta, k, g = acc_fmllr_stats(params, jnp.asarray(am.means()),
                                     jnp.asarray(am.inv_vars),
                                     jnp.asarray(x_spk), jnp.asarray(p),
                                     jnp.ones(len(p), np.float32),
                                     jnp.asarray(spk), 1)
        trans, imprs = estimate_fmllr_batch(np.asarray(beta), np.asarray(k),
                                            np.asarray(g), min_count=100)
        assert imprs[0] > 0.5, f"fMLLR impr {imprs[0]}"
        w = trans[0]
        x_adapted = x_spk @ w[:, :5].T + w[:, 5]
        # adapted loglike should beat unadapted
        ll_un = float(K.aligned_loglike(params, jnp.asarray(x_spk),
                                        jnp.asarray(p)))
        ll_ad = float(K.aligned_loglike(params, jnp.asarray(x_adapted),
                                        jnp.asarray(p)))
        assert ll_ad > ll_un + 0.3 * len(p)

    def test_min_count_returns_identity(self):
        am = random_gmm(dim=4)
        params = K.pack_gmm(am)
        x, p = sample_frames(am, 10)
        beta, k, g = acc_fmllr_stats(params, jnp.asarray(am.means()),
                                     jnp.asarray(am.inv_vars),
                                     jnp.asarray(x), jnp.asarray(p),
                                     jnp.ones(len(p), np.float32),
                                     jnp.zeros(len(p), np.int32), 1)
        trans, imprs = estimate_fmllr_batch(np.asarray(beta), np.asarray(k),
                                            np.asarray(g), min_count=500)
        np.testing.assert_allclose(trans[0][:, :4], np.eye(4))
        assert imprs[0] == 0.0


class TestBasisFmllr:
    """Basis fMLLR (transform/basis-fmllr-diag-gmm.{h,cc} role)."""

    def _speaker_stats(self, am, params, n_frames, seed):
        rng = np.random.default_rng(seed)
        x, p = sample_frames(am, n_frames)
        a_true = np.eye(am.dim) + 0.25 * rng.standard_normal((am.dim, am.dim))
        b_true = 0.5 * rng.standard_normal(am.dim)
        x_spk = (x @ a_true.T + b_true).astype(np.float32)
        beta, k, g = acc_fmllr_stats(params, jnp.asarray(am.means()),
                                     jnp.asarray(am.inv_vars),
                                     jnp.asarray(x_spk), jnp.asarray(p),
                                     jnp.ones(len(p), np.float32),
                                     jnp.zeros(len(p), np.int32), 1)
        return (float(np.asarray(beta)[0]), np.asarray(k)[0],
                np.asarray(g)[0], x_spk, p)

    def test_basis_improves_sparse_speaker(self):
        from voicebridge_tpu.transforms.basis_fmllr import (
            estimate_fmllr_basis, train_fmllr_basis)

        am = random_gmm(num_pdfs=5, mix=1, dim=5)
        params = K.pack_gmm(am)
        # train basis from 8 well-observed speakers
        stats = [self._speaker_stats(am, params, 400, seed=100 + s)
                 for s in range(8)]
        basis = train_fmllr_basis(
            np.asarray([s[0] for s in stats]),
            np.stack([s[1] for s in stats]),
            np.stack([s[2] for s in stats]), num_bases=20)
        assert basis.size == 20 and basis.dim == 5

        # sparse test speaker: 60 frames, far below full-fMLLR min_count
        beta, k, g, x_spk, p = self._speaker_stats(am, params, 60, seed=999)
        w, impr, n = estimate_fmllr_basis(basis, beta, k, g,
                                          size_scale=0.2, min_count=20)
        assert 0 < n <= 12  # coefficient count adapted to beta
        assert impr > 0.05, f"basis-fMLLR impr {impr}"
        x_ad = x_spk @ w[:, :5].T + w[:, 5]
        ll_un = float(K.aligned_loglike(params, jnp.asarray(x_spk),
                                        jnp.asarray(p)))
        ll_ad = float(K.aligned_loglike(params, jnp.asarray(x_ad),
                                        jnp.asarray(p)))
        assert ll_ad > ll_un

    def test_basis_approaches_full_fmllr_with_data(self):
        from voicebridge_tpu.transforms.basis_fmllr import (
            estimate_fmllr_basis, train_fmllr_basis)

        am = random_gmm(num_pdfs=5, mix=1, dim=4)
        params = K.pack_gmm(am)
        stats = [self._speaker_stats(am, params, 400, seed=200 + s)
                 for s in range(10)]
        basis = train_fmllr_basis(
            np.asarray([s[0] for s in stats]),
            np.stack([s[1] for s in stats]),
            np.stack([s[2] for s in stats]))
        beta, k, g, _x, _p = self._speaker_stats(am, params, 1200, seed=55)
        _w_full, imprs = estimate_fmllr_batch(
            np.asarray([beta]), k[None], g[None], min_count=100)
        _w_b, impr_b, n = estimate_fmllr_basis(basis, beta, k, g,
                                               size_scale=1.0, num_iters=30)
        assert n == basis.size  # plenty of data -> all coefficients
        # with a full-rank basis and data, should reach most of full fMLLR
        assert impr_b > 0.6 * imprs[0], (impr_b, imprs[0])

    def test_basis_below_min_count_identity(self):
        from voicebridge_tpu.transforms.basis_fmllr import (
            estimate_fmllr_basis, train_fmllr_basis)

        am = random_gmm(num_pdfs=4, mix=1, dim=4)
        params = K.pack_gmm(am)
        stats = [self._speaker_stats(am, params, 300, seed=300 + s)
                 for s in range(4)]
        basis = train_fmllr_basis(
            np.asarray([s[0] for s in stats]),
            np.stack([s[1] for s in stats]),
            np.stack([s[2] for s in stats]))
        beta, k, g, _x, _p = self._speaker_stats(am, params, 10, seed=77)
        w, impr, n = estimate_fmllr_basis(basis, beta, k, g, min_count=50)
        np.testing.assert_allclose(w[:, :4], np.eye(4))
        assert impr == 0.0 and n == 0
