"""Golden-vector anchors for the pitch chain (VERDICT r4 ask #7).

The committed vectors were generated once by an INDEPENDENT transcription of
the published formulas (Ghahremani et al. 2014 + the Kaldi constants the
docstrings cite): per-frame/per-lag Python loops, direct windowed-sinc taps,
an O(L^2) loop Viterbi, per-frame POV-weighted normalization loops — none of
the production code's vectorized machinery (tools/pitch_golden_gen.py).  The
two implementations agreed to max|diff| 7.3e-6 (raw) / 1.0e-6 (processed) on
both waves at generation time; the goldens anchor the production chain to the
published formulas in the spirit of the HTK MFCC golden test
(feature-mfcc-test.cc:112-126 pattern).

Corpus-scale cost (round 5, measured): 50 audio-s/s single host thread at
5 s utterances (100 ms/utt) with the native O(L) lower-envelope Viterbi
(native/pitch.cpp); the numpy fallback runs 12.7 audio-s/s.
"""

import numpy as np

from voicebridge_tpu.ops.pitch import (PitchOptions, ProcessPitchOptions,
                                       compute_kaldi_pitch, process_pitch)

# deterministic test waves (identical construction to the generator)


def _waves():
    sr = 16000.0
    t = np.arange(int(sr * 0.6)) / sr
    rng = np.random.default_rng(123)
    tone = (0.5 * np.sin(2 * np.pi * 120.0 * t)
            + 0.05 * rng.standard_normal(len(t)))
    f = 100.0 + (200.0 - 100.0) * t / t[-1]
    chirp = (0.4 * np.sin(2 * np.pi * np.cumsum(f) / sr)
             + 0.05 * rng.standard_normal(len(t)))
    return {"tone120": tone * 8000, "chirp100_200": chirp * 8000}


_FRAMES = [0, 7, 14, 21, 28, 35, 42, 49]

# (pov_feature, normalized_log_pitch, delta_pitch[noise-free]) at _FRAMES
_GOLDEN = {
    "tone120": np.asarray([
        [-1.093078, -0.004097, 0.0],
        [-1.090372, -0.004097, 0.0],
        [-1.139764, -0.004097, -0.004988],
        [-1.108477, 0.005878, 0.0],
        [-1.124911, 0.005878, 0.0],
        [-1.059348, -0.004097, 0.0],
        [-1.142785, -0.004097, 0.0],
        [-1.127056, -0.004097, 0.009975],
    ]),
    "chirp100_200": np.asarray([
        [-1.006899, -0.690606, 0.049876],
        [-1.007198, -0.491105, 0.134664],
        [-1.014509, -0.301578, 0.139651],
        [-1.061989, -0.112052, 0.134664],
        [-1.042702, 0.0276, 0.114714],
        [-1.053732, 0.197176, 0.099751],
        [-1.09257, 0.336827, 0.099751],
        [-1.047097, 0.466503, 0.089776],
    ]),
}


class TestPitchGolden:
    def test_processed_features_match_independent_formulas(self):
        noise_free = ProcessPitchOptions(delta_pitch_noise_stddev=0.0)
        for name, wave in _waves().items():
            raw = compute_kaldi_pitch(wave, PitchOptions())
            assert raw.shape[0] == 56, name
            proc = process_pitch(raw, noise_free)
            got = proc[_FRAMES]
            np.testing.assert_allclose(
                got, _GOLDEN[name], atol=2e-4, rtol=0,
                err_msg=f"{name}: drift from the published-formula goldens")

    def test_tracks_physical(self):
        """The raw tracker must land on the true F0 of the tone (120 Hz
        within one geometric lag step) for high-POV frames."""
        raw = compute_kaldi_pitch(_waves()["tone120"], PitchOptions())
        mid = raw[5:-5]
        assert (np.abs(mid[:, 1] - 120.0) / 120.0 < 0.02).all()
