"""Golden tests for the MFCC/delta/splice frontend.

Strategy mirrors the reference's (SURVEY.md §4: feature-mfcc-test.cc compares
against HTK golden files): here we compare the batched JAX chain against an
independent, straight-line numpy transcription of the Kaldi formulas, plus
property tests (DCT orthogonality, edge clamping).
"""

import math

import numpy as np
import pytest

from voicebridge_tpu.config import (DeltaOptions, FrameOptions, MelOptions,
                                    MfccOptions, SpliceOptions)
from voicebridge_tpu.ops import features as F
from voicebridge_tpu.transforms import cmvn as C

RNG = np.random.default_rng(1234)


def ref_mfcc(wave: np.ndarray, opts: MfccOptions) -> np.ndarray:
    """Independent numpy MFCC per the Kaldi definition (dither=0 assumed)."""
    fo = opts.frame_opts
    ws, shift = fo.window_size, fo.window_shift
    nf = fo.num_frames(len(wave))
    window = F.feature_window(fo).astype(np.float64)
    mel = F.mel_bank_matrix(opts.mel_opts.num_bins, fo,
                            opts.mel_opts.low_freq, opts.mel_opts.high_freq).astype(np.float64)
    dct = F.dct_matrix(opts.num_ceps, opts.mel_opts.num_bins).astype(np.float64)
    lif = F.lifter_coeffs(opts.num_ceps, opts.cepstral_lifter).astype(np.float64)
    out = np.zeros((nf, opts.num_ceps))
    eps = float(np.finfo(np.float32).eps)
    for t in range(nf):
        frame = wave[t * shift : t * shift + ws].astype(np.float64).copy()
        if fo.remove_dc_offset:
            frame -= frame.mean()
        log_e = math.log(max(np.dot(frame, frame), eps))
        if fo.preemph_coeff != 0.0:
            frame[1:] -= fo.preemph_coeff * frame[:-1]
            frame[0] -= fo.preemph_coeff * frame[0]
        frame *= window
        padded = np.zeros(fo.padded_window_size)
        padded[:ws] = frame
        spec = np.fft.rfft(padded)
        power = (spec.real**2 + spec.imag**2)[: fo.padded_window_size // 2]
        mel_e = mel @ power
        logmel = np.log(np.maximum(mel_e, eps))
        ceps = (dct @ logmel) * lif
        if opts.use_energy:
            ceps[0] = log_e
        out[t] = ceps
    return out.astype(np.float32)


def nodither_opts(**kw):
    fo = FrameOptions(dither=0.0, **kw.pop("frame_kw", {}))
    return MfccOptions(frame_opts=fo, **kw)


class TestMfcc:
    def test_matches_numpy_reference(self):
        opts = nodither_opts()
        wave = (RNG.standard_normal(16000) * 1000).astype(np.float32)
        got = F.MfccExtractor(opts)(wave)
        want = ref_mfcc(wave, opts)
        assert got.shape == want.shape == (98, 13)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-3)

    def test_no_energy_no_liftering(self):
        opts = nodither_opts(use_energy=False, cepstral_lifter=22.0)
        wave = (RNG.standard_normal(8000) * 500).astype(np.float32)
        got = F.MfccExtractor(opts)(wave)
        np.testing.assert_allclose(got, ref_mfcc(wave, opts), rtol=2e-4, atol=2e-3)

    def test_batched_matches_single(self):
        opts = nodither_opts()
        ext = F.MfccExtractor(opts)
        lens = [4000, 7200, 16000]
        waves = np.zeros((3, 16000), np.float32)
        for i, l in enumerate(lens):
            waves[i, :l] = RNG.standard_normal(l) * 300
        max_frames = opts.frame_opts.num_frames(16000)
        feats, counts = ext.batched(waves, np.array(lens), max_frames)
        feats, counts = np.asarray(feats), np.asarray(counts)
        for i, l in enumerate(lens):
            single = ext(waves[i, :l])
            assert counts[i] == single.shape[0]
            np.testing.assert_allclose(feats[i, : counts[i]], single, rtol=1e-4, atol=1e-3)

    def test_dct_orthonormal(self):
        d = F.dct_matrix(23, 23)
        np.testing.assert_allclose(d @ d.T, np.eye(23), atol=1e-5)

    def test_mel_bank_shape_and_coverage(self):
        fo = FrameOptions()
        m = F.mel_bank_matrix(23, fo)
        assert m.shape == (23, 256)
        assert (m >= 0).all()
        # every bin has some support; interior fft bins are covered
        assert (m.sum(axis=1) > 0).all()

    def test_frame_count(self):
        fo = FrameOptions()
        assert fo.num_frames(16000) == 98
        assert fo.num_frames(400) == 1
        assert fo.num_frames(399) == 0


class TestDeltasSplice:
    def test_delta_scales_match_kaldi(self):
        s = F.delta_scales(2, 2)
        np.testing.assert_allclose(s[1], np.array([-2, -1, 0, 1, 2]) / 10.0)
        assert len(s[2]) == 9
        np.testing.assert_allclose(s[2].sum(), 0.0, atol=1e-7)

    def test_deltas_match_naive(self):
        t, d = 17, 5
        x = RNG.standard_normal((t, d)).astype(np.float32)
        got = np.asarray(F.add_deltas(x, t))
        scales = F.delta_scales(2, 2)
        want = np.zeros((t, 3 * d), np.float32)
        for order, s in enumerate(scales):
            off = (len(s) - 1) // 2
            for frame in range(t):
                acc = np.zeros(d)
                for j in range(-off, off + 1):
                    idx = min(max(frame + j, 0), t - 1)
                    acc += s[j + off] * x[idx]
                want[frame, order * d : (order + 1) * d] = acc
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_deltas_respect_valid_length(self):
        # padded frames beyond num_frames must not affect valid rows
        x = RNG.standard_normal((20, 4)).astype(np.float32)
        full = np.asarray(F.add_deltas(x[:12], 12))
        padded = x.copy()
        padded[12:] = 1e6
        got = np.asarray(F.add_deltas(padded, 12))
        np.testing.assert_allclose(got[:12], full, rtol=1e-5)

    def test_splice(self):
        x = np.arange(12, dtype=np.float32).reshape(6, 2)
        got = np.asarray(F.splice_frames(x, 6, SpliceOptions(1, 1)))
        assert got.shape == (6, 6)
        np.testing.assert_allclose(got[0], [0, 1, 0, 1, 2, 3])  # left edge clamped
        np.testing.assert_allclose(got[3], [4, 5, 6, 7, 8, 9])
        np.testing.assert_allclose(got[5], [8, 9, 10, 11, 10, 11])  # right edge


class TestCmvn:
    def test_apply_cmvn_zero_mean(self):
        x = RNG.standard_normal((50, 13)).astype(np.float32) * 3 + 5
        stats = C.acc_cmvn_stats(x)
        out = np.asarray(C.apply_cmvn(x, stats, norm_vars=True))
        np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-4)
        np.testing.assert_allclose(out.std(axis=0), 1, atol=1e-3)

    def test_batch_stats_match_per_speaker(self):
        b, t, d = 4, 30, 7
        feats = RNG.standard_normal((b, t, d)).astype(np.float32)
        nf = np.array([30, 20, 10, 25])
        spk = np.array([0, 0, 1, 1])
        stats = np.asarray(C.acc_cmvn_stats_batch(feats, nf, spk, 2))
        want0 = C.acc_cmvn_stats(np.concatenate([feats[0, :30], feats[1, :20]]))
        np.testing.assert_allclose(stats[0], want0, rtol=1e-4, atol=1e-3)

    def test_fake_stats_noop_mean(self):
        x = RNG.standard_normal((10, 5)).astype(np.float32)
        out = np.asarray(C.apply_cmvn(x, C.fake_cmvn_stats(5), norm_vars=True))
        np.testing.assert_allclose(out, x, rtol=1e-5)
