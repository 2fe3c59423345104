"""Parity of the fused Pallas MFCC/fbank kernel vs the jnp reference path
(interpreter mode on CPU; real-chip timings in tools/bench_pallas.py).

The jnp path itself is validated against the reference's shipped HTK golden
features (tests/test_features_golden.py), so parity here chains to the
golden files.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from voicebridge_tpu.config import FrameOptions, MelOptions, MfccOptions
from voicebridge_tpu.ops.features import FbankExtractor, MfccExtractor
from voicebridge_tpu.ops.pallas_mfcc import MfccPallas


def _wave(n=8000, sr=8000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    return (3000 * np.sin(2 * np.pi * 313 * t)
            + 1200 * np.sin(2 * np.pi * 1170 * t + 0.3)
            + 80 * rng.standard_normal(n)).astype(np.float32)


def _opts(**kw):
    fo = FrameOptions(samp_freq=8000.0, dither=0.0)
    return MfccOptions(frame_opts=fo, **kw)


def test_pallas_mfcc_matches_jnp():
    opts = _opts()
    ref = MfccExtractor(opts)
    pk = MfccPallas(opts, interpret=True)
    w = _wave()
    a = ref(w)
    b = pk(w)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-3)


def test_pallas_mfcc_use_energy_htk_compat():
    for use_energy, htk_compat in [(True, False), (False, True), (True, True)]:
        opts = _opts(use_energy=use_energy, htk_compat=htk_compat,
                     energy_floor=1e-10 if use_energy else 0.0)
        a = MfccExtractor(opts)(_wave(seed=2))
        b = MfccPallas(opts, interpret=True)(_wave(seed=2))
        np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-3,
                                   err_msg=f"{use_energy=} {htk_compat=}")


def test_pallas_fbank_matches_jnp():
    # FbankExtractor takes use_energy as a ctor flag; MfccPallas(fbank=True)
    # reads opts.use_energy — align them
    opts = _opts(use_energy=False)
    a = FbankExtractor(opts)(_wave(seed=3))
    b = MfccPallas(opts, fbank=True, interpret=True)(_wave(seed=3))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-3)


def test_pallas_fbank_use_energy():
    opts = _opts(use_energy=True)
    a = FbankExtractor(opts, use_energy=True)(_wave(seed=4))
    b = MfccPallas(opts, fbank=True, interpret=True)(_wave(seed=4))
    assert b.shape == a.shape
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-3)


def test_pallas_mfcc_batched_matches():
    opts = _opts()
    ref = MfccExtractor(opts)
    pk = MfccPallas(opts, interpret=True)
    waves = np.stack([_wave(seed=s) for s in range(3)])
    lens = np.array([8000, 6500, 4000])
    for i, n in enumerate(lens):
        waves[i, n:] = 0.0
    wj = jnp.asarray(waves)
    nj = jnp.asarray(lens)
    fa, ca = ref.batched(wj, nj, 99)
    fb, cb = pk.batched(wj, nj, 99)
    np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    for i in range(3):
        n = int(ca[i])
        np.testing.assert_allclose(np.asarray(fb)[i, :n], np.asarray(fa)[i, :n],
                                   rtol=2e-4, atol=2e-3)


def test_pallas_mfcc_dither_parity():
    """Dither is applied outside the kernel with the same jax.random stream,
    so even dithered features match the jnp path exactly."""
    fo = FrameOptions(samp_freq=8000.0, dither=1.0)
    opts = MfccOptions(frame_opts=fo)
    key = jax.random.PRNGKey(11)
    w = _wave(seed=6)
    a = MfccExtractor(opts)(w, dither_key=key)
    b = MfccPallas(opts, interpret=True)(w, dither_key=key)
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-3)


def test_pallas_mfcc_16k_window():
    """16 kHz / 400-sample window exercises the 512-pad path."""
    fo = FrameOptions(samp_freq=16000.0, dither=0.0)
    opts = MfccOptions(frame_opts=fo,
                       mel_opts=MelOptions(num_bins=23, low_freq=20.0))
    w = _wave(n=16000, sr=16000, seed=7)
    a = MfccExtractor(opts)(w)
    b = MfccPallas(opts, interpret=True)(w)
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-3)
