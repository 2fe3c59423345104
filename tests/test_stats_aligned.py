"""The aligned-gather E-step kernels (acc_gmm_stats_aligned / _chunked /
_twofeats) must match the all-pdf reference implementation exactly — they are
the corpus-scale path, the [N, P, M] kernel is the oracle."""

import numpy as np
import jax.numpy as jnp

from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.ops import gmm_kernels as K


def _random_am(rng, num_pdfs=17, max_mix=3, dim=9):
    return AmDiagGmm(
        rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32),
        np.abs(rng.standard_normal((num_pdfs, max_mix, dim))).astype(
            np.float32) + 0.5,
        np.full((num_pdfs, max_mix), 1.0 / max_mix, np.float32))


def test_aligned_stats_match_all_pdf_reference():
    rng = np.random.default_rng(0)
    am = _random_am(rng)
    params = K.pack_gmm(am)
    n, p = 501, am.num_pdfs
    x = rng.standard_normal((n, am.dim)).astype(np.float32)
    pdfs = rng.integers(0, p, n).astype(np.int32)
    w = rng.random(n).astype(np.float32)
    w[::7] = 0.0

    occ_r, macc_r, vacc_r = K.acc_gmm_stats(
        params, jnp.asarray(x), jnp.asarray(pdfs), p, jnp.asarray(w))
    ll_r = float(K.aligned_loglike(params, jnp.asarray(x), jnp.asarray(pdfs),
                                   jnp.asarray(w)))

    occ, macc, vacc, ll = K.acc_gmm_stats_aligned(
        params, jnp.asarray(x), jnp.asarray(pdfs), p, jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(occ), np.asarray(occ_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(macc), np.asarray(macc_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(vacc), np.asarray(vacc_r), atol=1e-4)
    assert abs(float(ll) - ll_r) < 1e-2 * max(1.0, abs(ll_r))

    # chunked wrapper: several padded chunks (chunk floor is 4096, so use a
    # tiny chunk argument to exercise the pad path plus multiple dispatches)
    occ_c, macc_c, vacc_c, ll_c = K.acc_gmm_stats_chunked(
        params, x, pdfs, p, w, chunk=128)
    np.testing.assert_allclose(occ_c, np.asarray(occ_r), atol=1e-4)
    np.testing.assert_allclose(macc_c, np.asarray(macc_r), atol=1e-4)
    np.testing.assert_allclose(vacc_c, np.asarray(vacc_r), atol=1e-4)
    assert abs(ll_c - ll_r) < 1e-2 * max(1.0, abs(ll_r))


def test_twofeats_posterior_feature_split():
    """Posteriors must come from x_post, statistics from x_acc (the
    gmm-acc-stats-twofeats contract)."""
    rng = np.random.default_rng(1)
    am = _random_am(rng)
    params = K.pack_gmm(am)
    n, p = 200, am.num_pdfs
    x_post = rng.standard_normal((n, am.dim)).astype(np.float32)
    x_acc = rng.standard_normal((n, am.dim)).astype(np.float32)
    pdfs = rng.integers(0, p, n).astype(np.int32)
    w = np.ones(n, np.float32)

    occ, macc, vacc, _ = K.acc_gmm_stats_twofeats_chunked(
        params, x_post, x_acc, pdfs, p, w, chunk=64)

    # manual reference
    comp = np.asarray(K.component_logliks(params, jnp.asarray(x_post)))
    sel = comp[np.arange(n), pdfs]  # [N, M]
    gamma = np.exp(sel - sel.max(1, keepdims=True))
    gamma /= gamma.sum(1, keepdims=True)
    occ_r = np.zeros_like(occ)
    macc_r = np.zeros_like(macc)
    np.add.at(occ_r, pdfs, gamma)
    np.add.at(macc_r, pdfs, gamma[:, :, None] * x_acc[:, None, :])
    np.testing.assert_allclose(occ, occ_r, atol=1e-4)
    np.testing.assert_allclose(macc, macc_r, atol=1e-4)
