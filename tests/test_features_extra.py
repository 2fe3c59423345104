"""Tests for the extended feature frontend: fbank/spectrogram, VTLN,
resampling, segments, pitch, and pronunciation statistics."""

import numpy as np
import pytest

from voicebridge_tpu.config import FrameOptions, MfccOptions
from voicebridge_tpu.ops import features as F
from voicebridge_tpu.ops.pitch import (PitchOptions, compute_pitch_feats,
                                       paste_feats)
from voicebridge_tpu.utils.wave import extract_segment, resample

RNG = np.random.default_rng(3)


class TestExtractors:
    def test_fbank_shape_and_log(self):
        opts = MfccOptions(frame_opts=FrameOptions(dither=0.0))
        ext = F.FbankExtractor(opts)
        wave = RNG.standard_normal(8000).astype(np.float32) * 500
        out = ext(wave)
        assert out.shape == (48, 23)
        assert np.isfinite(out).all()

    def test_spectrogram(self):
        opts = MfccOptions(frame_opts=FrameOptions(dither=0.0))
        ext = F.SpectrogramExtractor(opts)
        wave = RNG.standard_normal(4800).astype(np.float32) * 500
        out = ext(wave)
        assert out.shape[1] == 257
        assert np.isfinite(out).all()

    def test_vtln_warp_changes_banks(self):
        fo = FrameOptions()
        m1 = F.mel_bank_matrix(23, fo, vtln_warp=1.0)
        m2 = F.mel_bank_matrix(23, fo, vtln_warp=1.2)
        assert np.abs(m1 - m2).max() > 0.01
        # identity warp
        m3 = F.mel_bank_matrix(23, fo, vtln_warp=1.0)
        np.testing.assert_allclose(m1, m3)


class TestResample:
    def test_tone_preserved(self):
        sr_in, sr_out = 16000.0, 8000.0
        t = np.arange(16000) / sr_in
        tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
        out = resample(tone, sr_in, sr_out)
        assert abs(len(out) - 8000) <= 1
        # dominant frequency preserved
        spec = np.abs(np.fft.rfft(out[100:-100] * np.hanning(len(out) - 200)))
        peak = np.argmax(spec) * sr_out / (len(out) - 200)
        assert abs(peak - 440) < 10

    def test_identity(self):
        x = RNG.standard_normal(100).astype(np.float32)
        np.testing.assert_allclose(resample(x, 8000, 8000), x)

    def test_segment(self):
        x = np.arange(16000, dtype=np.float32)
        seg = extract_segment(x, 16000.0, 0.5, 0.75)
        assert len(seg) == 4000 and seg[0] == 8000


class TestPitch:
    def test_tracks_tone_frequency(self):
        sr = 8000.0
        t = np.arange(8000) / sr
        f0 = 150.0
        wave = (np.sin(2 * np.pi * f0 * t) +
                0.5 * np.sin(2 * np.pi * 2 * f0 * t)).astype(np.float32)
        opts = PitchOptions(samp_freq=sr)
        feats = compute_pitch_feats(wave * 5000, opts)
        assert feats.shape[1] == 3
        # recover f0 from the unnormalized track: use nccf/viterbi directly
        from voicebridge_tpu.ops.pitch import compute_nccf, viterbi_pitch

        nccf, lags = compute_nccf(wave * 5000, opts)
        track = viterbi_pitch(nccf, lags, opts)
        f0_est = sr / lags[track]
        mid = f0_est[len(f0_est) // 4: -len(f0_est) // 4]
        assert abs(np.median(mid) - f0) < 10, np.median(mid)
        # voiced tone => high POV
        assert feats[:, 0].mean() > 0.3

    def test_paste(self):
        a = np.zeros((10, 4), np.float32)
        b = np.ones((12, 3), np.float32)
        out = paste_feats(a, b)
        assert out.shape == (10, 7)


class TestGetProns:
    def test_segment_words(self):
        from voicebridge_tpu.steps.get_prons import segment_words

        lexicon = {"YES": [(1.0, ("Y", "EH", "S"))], "NO": [(1.0, ("N", "OW"))]}
        phones = ["SIL", "Y", "EH", "S", "N", "OW", "SIL"]
        seg = segment_words(phones, ["YES", "NO"], lexicon)
        assert seg is not None
        words = [w for w, _p in seg]
        assert words == [None, "YES", "NO", None]

    def test_pron_prob_estimation(self):
        from voicebridge_tpu.steps.get_prons import estimate_pron_probs

        lexicon = {"A": [(1.0, ("AH",)), (1.0, ("EY",))]}
        from collections import Counter

        counts = Counter({("A", ("AH",)): 9, ("A", ("EY",)): 1})
        out = estimate_pron_probs(lexicon, counts)
        probs = {p: pr for pr, p in out["A"]}
        assert probs[("AH",)] == 1.0 and probs[("EY",)] < 0.5
