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
    """Golden-style semantic tests of the Kaldi-fidelity tracker on
    synthesized tones (pitch-functions.{h,cc} contract, VERDICT r3 #7)."""

    def _tone(self, sr, f0, secs=1.0, harmonics=(1.0, 0.5)):
        t = np.arange(int(sr * secs)) / sr
        return sum(a * np.sin(2 * np.pi * (k + 1) * f0 * t)
                   for k, a in enumerate(harmonics)).astype(np.float32)

    def test_tracks_tone_frequency(self):
        sr = 8000.0
        f0 = 150.0
        wave = self._tone(sr, f0) * 5000
        opts = PitchOptions(samp_freq=sr)
        from voicebridge_tpu.ops.pitch import compute_kaldi_pitch

        raw = compute_kaldi_pitch(wave, opts)
        assert raw.shape[1] == 2  # (nccf_pov, pitch_hz)
        mid = raw[len(raw) // 4: -len(raw) // 4, 1]
        assert abs(np.median(mid) - f0) < 10, np.median(mid)
        # voiced tone => POV probability near 1
        from voicebridge_tpu.ops.pitch import nccf_to_pov

        assert nccf_to_pov(raw[:, 0]).mean() > 0.8

    def test_pov_contrast_voiced_vs_noise(self):
        sr = 8000.0
        rng = np.random.default_rng(0)
        tone = self._tone(sr, 180.0) * 5000
        noise = rng.standard_normal(len(tone)).astype(np.float32) * 5000
        from voicebridge_tpu.ops.pitch import compute_kaldi_pitch, nccf_to_pov

        opts = PitchOptions(samp_freq=sr)
        pov_t = nccf_to_pov(compute_kaldi_pitch(tone, opts)[:, 0]).mean()
        pov_n = nccf_to_pov(compute_kaldi_pitch(noise, opts)[:, 0]).mean()
        assert pov_t > 0.8 and pov_n < 0.4, (pov_t, pov_n)

    def test_processed_contract_and_delta_sign(self):
        """Default 3-dim output (pov, normalized-log-pitch, delta-pitch);
        a rising pitch glide gives positive delta-pitch, and the normalized
        log pitch is ~zero-mean over the utterance."""
        sr = 8000.0
        secs = 1.2
        t = np.arange(int(sr * secs)) / sr
        f0 = 120.0 * np.exp(0.4 * t)  # glide 120 -> ~193 Hz
        phase = 2 * np.pi * np.cumsum(f0) / sr
        wave = (np.sin(phase) + 0.5 * np.sin(2 * phase)).astype(np.float32)
        opts = PitchOptions(samp_freq=sr)
        feats = compute_pitch_feats(wave * 5000, opts)
        assert feats.shape[1] == 3
        mid = slice(len(feats) // 4, -len(feats) // 4)
        assert feats[mid, 2].mean() > 0.0  # rising => positive delta
        assert abs(feats[mid, 1].mean()) < 1.0  # mean-normalized
        # raw-log-pitch column appears when requested and tracks log f0
        from voicebridge_tpu.ops.pitch import (ProcessPitchOptions,
                                               compute_kaldi_pitch,
                                               process_pitch)

        raw = compute_kaldi_pitch(wave * 5000, opts)
        full = process_pitch(raw, ProcessPitchOptions(add_raw_log_pitch=True))
        assert full.shape[1] == 4
        k = len(raw) // 2
        assert abs(full[k, 3] - np.log(raw[k, 1])) < 1e-4

    def test_delta_pitch_noise_deterministic_per_seed(self):
        sr = 8000.0
        wave = self._tone(sr, 150.0) * 5000
        opts = PitchOptions(samp_freq=sr)
        a = compute_pitch_feats(wave, opts, seed=1)
        b = compute_pitch_feats(wave, opts, seed=1)
        c = compute_pitch_feats(wave, opts, seed=2)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a[:, 2], c[:, 2])  # noise differs
        np.testing.assert_array_equal(a[:, :2], c[:, :2])  # others don't

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


class TestPlp:
    """PLP extractor (reference: feat/feature-plp.cc Compute)."""

    def _ref_plp_frame(self, power, mel_mat, eql, idft, order, num_ceps, lifter):
        """Straightforward per-frame numpy PLP from a power spectrum."""
        mel = (mel_mat @ power) * eql
        mel = np.maximum(mel, np.finfo(np.float32).eps) ** 0.33333
        dup = np.concatenate([[mel[0]], mel, [mel[-1]]])
        ac = idft @ dup
        # scalar Levinson-Durbin (mirrors the reference's Durbin())
        e = ac[0]
        lp = np.zeros(order)
        for i in range(order):
            ki = ac[i + 1] + sum(lp[j] * ac[i - j] for j in range(i))
            ki /= e
            c = max(1.0 - ki * ki, 1.0e-5)
            e *= c
            tmp = np.empty(i + 1)
            tmp[i] = -ki
            for j in range(i):
                tmp[j] = lp[j] - ki * lp[i - j - 1]
            lp[: i + 1] = tmp
        ceps = np.zeros(order)
        for i in range(order):
            s = sum((i - j) * lp[j] * ceps[i - j - 1] for j in range(i))
            ceps[i] = -lp[i] - s / (i + 1)
        feat = np.concatenate([[np.log(max(e, np.finfo(np.float32).tiny))],
                               ceps[: num_ceps - 1]])
        return feat * lifter

    def test_matches_scalar_reference(self):
        from voicebridge_tpu.config import PlpOptions

        fo = FrameOptions(dither=0.0)
        opts = PlpOptions(frame_opts=fo, use_energy=False)
        ext = F.PlpExtractor(opts)
        wave = (RNG.standard_normal(6400) * 300).astype(np.float32)
        got = ext(wave)
        assert got.shape == (fo.num_frames(6400), 13)
        assert np.isfinite(got).all()

        # independent scalar recomputation of a few frames
        window = F.feature_window(fo)
        mel_mat = F.mel_bank_matrix(23, fo)
        centers = F.mel_center_freqs(23, fo)
        eql = F.equal_loudness_vector(centers)
        idft = F.idft_bases(13, 25)
        lifter = F.lifter_coeffs(13, 22.0)
        for t in (0, 5, 17):
            fr = wave[t * fo.window_shift: t * fo.window_shift + fo.window_size].copy()
            fr = fr - fr.mean()
            fr = fr - 0.97 * np.concatenate([[fr[0]], fr[:-1]])
            fr = fr * window
            padded = np.zeros(fo.padded_window_size, np.float32)
            padded[: len(fr)] = fr
            spec = np.fft.rfft(padded)
            power = (spec.real**2 + spec.imag**2)[: fo.padded_window_size // 2]
            want = self._ref_plp_frame(power.astype(np.float64), mel_mat, eql,
                                       idft, 12, 13, lifter)
            np.testing.assert_allclose(got[t], want, rtol=2e-3, atol=2e-3)

    def test_use_energy_c0(self):
        from voicebridge_tpu.config import PlpOptions

        fo = FrameOptions(dither=0.0)
        wave = (RNG.standard_normal(4800) * 300).astype(np.float32)
        ext = F.PlpExtractor(PlpOptions(frame_opts=fo, use_energy=True))
        out = ext(wave)
        # C0 must equal the raw frame log-energy
        fr = wave[: fo.window_size] - wave[: fo.window_size].mean()
        want = np.log(np.sum(fr * fr))
        np.testing.assert_allclose(out[0, 0], want, rtol=1e-4)

    def test_batched_matches_single(self):
        from voicebridge_tpu.config import PlpOptions
        import jax.numpy as jnp

        fo = FrameOptions(dither=0.0)
        ext = F.PlpExtractor(PlpOptions(frame_opts=fo))
        lens = [4000, 6400]
        waves = np.zeros((2, 6400), np.float32)
        for i, n in enumerate(lens):
            waves[i, :n] = RNG.standard_normal(n) * 200
        feats, counts = ext.batched(jnp.asarray(waves), jnp.asarray(lens),
                                    fo.num_frames(6400))
        for i, n in enumerate(lens):
            single = ext(waves[i, :n])
            np.testing.assert_allclose(np.asarray(feats)[i, : int(counts[i])],
                                       single, rtol=1e-4, atol=1e-4)


class TestCmvnVariants:
    def test_two_channel_weights(self):
        from voicebridge_tpu.transforms import cmvn

        a = RNG.standard_normal((50, 13)).astype(np.float32)
        b = RNG.standard_normal((50, 13)).astype(np.float32)
        sa, sb = cmvn.acc_cmvn_stats_two_channel(a, b, 0.01)
        # every frame contributes 1.0 to the louder side, 0.01 to the quieter
        np.testing.assert_allclose(sa[0, 13] + sb[0, 13], 50 * 1.01, rtol=1e-5)
        louder_a = int((a[:, 0] > b[:, 0]).sum())
        np.testing.assert_allclose(sa[0, 13], louder_a + 0.01 * (50 - louder_a),
                                   rtol=1e-5)
        # length mismatch falls back to independent stats
        sa2, sb2 = cmvn.acc_cmvn_stats_two_channel(a, b[:30])
        np.testing.assert_allclose(sa2, cmvn.acc_cmvn_stats(a))

    def test_utterance_pairs(self):
        from voicebridge_tpu.transforms.cmvn import utterance_pairs

        rows = [("c1-A", "c1", "A"), ("c1-B", "c1", "B"), ("c2-A", "c2", "A")]
        assert utterance_pairs(rows) == [["c1-A", "c1-B"], ["c2-A"]]

    def test_modify_cmvn_stats(self):
        from voicebridge_tpu.transforms import cmvn

        a = RNG.standard_normal((40, 8)).astype(np.float32) + 3.0
        stats = cmvn.acc_cmvn_stats(a)
        m = cmvn.modify_cmvn_stats(stats, skip_dims=[0, 3])
        # faked dims: zero mean, unit variance
        assert m[0, 0] == 0.0 and m[0, 3] == 0.0
        np.testing.assert_allclose(m[1, 0], m[0, 8], rtol=1e-6)
        mv = cmvn.modify_cmvn_stats(stats, convert_to_mean_and_var=True)
        np.testing.assert_allclose(mv[0], a.mean(0), rtol=1e-4)
        np.testing.assert_allclose(mv[1], a.var(0), rtol=1e-3)


class TestMakeMfccPitch:
    def test_composite_frontend(self):
        """MakeMfccPitch role (scr/steps/make_mfcc_pitch.cpp): MFCC+pitch
        pasted, then CMVN+deltas over the 16-dim composite."""
        from voicebridge_tpu.config import FrameOptions, MfccOptions
        from voicebridge_tpu.steps.make_feats import make_features

        sr = 16000.0
        t = np.arange(16000) / sr
        waves = {
            "u1": (np.sin(2 * np.pi * 150 * t) * 5000).astype(np.float32),
            "u2": (np.sin(2 * np.pi * 220 * t) * 5000).astype(np.float32),
        }
        utt2spk = {"u1": "s1", "u2": "s1"}
        opts = MfccOptions(frame_opts=FrameOptions(samp_freq=sr, dither=0.0))
        out = make_features(waves, utt2spk, opts, pitch=True)
        assert set(out) == {"u1", "u2"}
        # 13 MFCC + 3 pitch = 16 base dims, x3 after delta+delta-delta
        assert out["u1"].shape[1] == 48
        assert np.isfinite(out["u1"]).all()
