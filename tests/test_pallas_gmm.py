"""Parity of the fused Pallas GMM loglik kernel vs the XLA reference path.

Runs in Pallas interpreter mode on the CPU test mesh; the real-chip numbers
come from bench.py / tools/bench_pallas.py.
"""

import numpy as np
import jax.numpy as jnp

from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.ops import gmm_kernels as K
from voicebridge_tpu.ops.pallas_gmm import (loglikes_batch_pallas,
                                            loglikes_pallas, pack_gmm_pallas)


def _random_am(num_pdfs=37, max_mix=5, dim=13, seed=0, ragged=False):
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32)
    inv_vars = (np.abs(rng.standard_normal((num_pdfs, max_mix, dim)))
                .astype(np.float32) + 0.3)
    weights = rng.random((num_pdfs, max_mix)).astype(np.float32)
    if ragged:
        # deactivate a random suffix of components per pdf (weight 0)
        for p in range(num_pdfs):
            k = rng.integers(1, max_mix + 1)
            weights[p, k:] = 0.0
    weights /= weights.sum(axis=1, keepdims=True)
    return AmDiagGmm(means * inv_vars, inv_vars, weights)


def test_pallas_gmm_matches_xla():
    am = _random_am()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((300, 13)), jnp.float32)
    ref = K.loglikes(K.pack_gmm(am), x)
    got = loglikes_pallas(pack_gmm_pallas(am), x, am.num_pdfs, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_pallas_gmm_ragged_components():
    """Inactive mixture components (gconst=-inf) must be masked identically."""
    am = _random_am(num_pdfs=21, max_mix=7, dim=11, seed=3, ragged=True)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((64, 11)), jnp.float32)
    ref = K.loglikes(K.pack_gmm(am), x)
    got = loglikes_pallas(pack_gmm_pallas(am), x, am.num_pdfs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)


def test_pallas_gmm_batched():
    am = _random_am(num_pdfs=130, max_mix=3, dim=39, seed=5)
    rng = np.random.default_rng(6)
    feats = jnp.asarray(rng.standard_normal((4, 50, 39)), jnp.float32)
    ref = K.loglikes_batch(K.pack_gmm(am), feats)
    got = loglikes_batch_pallas(pack_gmm_pallas(am), feats, am.num_pdfs,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-4)
