"""Synthetic Yes-No-style corpus for end-to-end tests.

The reference's integration oracle is the Yes-No example (~1 min corpus,
WER ~2%, SURVEY.md §4.3).  Its audio ships separately, so tests synthesize an
equivalent: two acoustically distinct tone-words ("YES" = rising two-tone,
"NO" = low tone) separated by silence, with additive noise — trivially
separable by a working GMM-HMM pipeline, i.e. WER ~0 is the regression target.
"""

from __future__ import annotations

import numpy as np

SR = 8000.0


def _tone(freqs, dur, rng, amp=6000.0):
    n = int(dur * SR)
    t = np.arange(n) / SR
    sig = np.zeros(n)
    seg = n // len(freqs)
    for i, f in enumerate(freqs):
        lo = i * seg
        hi = n if i == len(freqs) - 1 else (i + 1) * seg
        # slight vibrato + harmonics for realism
        ph = 2 * np.pi * f * t[lo:hi] + 0.3 * np.sin(2 * np.pi * 3.0 * t[lo:hi])
        sig[lo:hi] = np.sin(ph) + 0.3 * np.sin(2 * ph)
    env = np.minimum(1.0, np.minimum(np.arange(n), n - np.arange(n)) / (0.01 * SR))
    return amp * env * sig


def _silence(dur, rng, amp=80.0):
    return amp * rng.standard_normal(int(dur * SR))


def synth_utterance(words: list[str], rng, noise=60.0):
    parts = [_silence(rng.uniform(0.15, 0.3), rng)]
    for w in words:
        dur = rng.uniform(0.25, 0.4)
        if w == "YES":
            parts.append(_tone([700.0, 1100.0], dur, rng))
        elif w == "NO":
            parts.append(_tone([300.0], dur, rng))
        else:
            raise ValueError(w)
        parts.append(_silence(rng.uniform(0.12, 0.25), rng))
    wave = np.concatenate(parts)
    wave = wave + noise * rng.standard_normal(len(wave))
    return wave.astype(np.float32)


def make_corpus(num_train=24, num_test=8, max_words=4, seed=0):
    """Returns (train, test): each a dict utt -> (wave, word list)."""
    rng = np.random.default_rng(seed)

    def gen(n, tag):
        out = {}
        for i in range(n):
            k = int(rng.integers(1, max_words + 1))
            words = [("YES" if rng.random() < 0.5 else "NO") for _ in range(k)]
            out[f"{tag}_{i:03d}"] = (synth_utterance(words, rng), words)
        return out

    return gen(num_train, "train"), gen(num_test, "test")


def make_speaker_corpus(num_speakers=4, utts_per_speaker=6, num_test_per=2,
                        max_words=4, seed=0):
    """Speaker-varied corpus for SAT/fMLLR tests: each speaker warps the word
    frequencies (vocal-tract-length-like) and has its own gain.

    Returns (train, test, utt2spk): dicts utt -> (wave, words)."""
    rng = np.random.default_rng(seed)
    utt2spk = {}
    train, test = {}, {}
    for s in range(num_speakers):
        warp = rng.uniform(0.8, 1.25)
        gain = rng.uniform(0.6, 1.4)

        def utt(words):
            parts = [_silence(rng.uniform(0.15, 0.3), rng)]
            for w in words:
                dur = rng.uniform(0.25, 0.4)
                if w == "YES":
                    parts.append(_tone([700.0 * warp, 1100.0 * warp], dur, rng,
                                       amp=6000.0 * gain))
                else:
                    parts.append(_tone([300.0 * warp], dur, rng,
                                       amp=6000.0 * gain))
                parts.append(_silence(rng.uniform(0.12, 0.25), rng))
            wave = np.concatenate(parts)
            return (wave + 60.0 * rng.standard_normal(len(wave))).astype(np.float32)

        for i in range(utts_per_speaker):
            k = int(rng.integers(1, max_words + 1))
            words = [("YES" if rng.random() < 0.5 else "NO") for _ in range(k)]
            key = f"spk{s}_train_{i:02d}"
            train[key] = (utt(words), words)
            utt2spk[key] = f"spk{s}"
        for i in range(num_test_per):
            k = int(rng.integers(1, max_words + 1))
            words = [("YES" if rng.random() < 0.5 else "NO") for _ in range(k)]
            key = f"spk{s}_test_{i:02d}"
            test[key] = (utt(words), words)
            utt2spk[key] = f"spk{s}"
    return train, test, utt2spk


LEXICON = {
    "YES": [(1.0, ("Y", "EH", "S"))],
    "NO": [(1.0, ("N", "OW"))],
}
