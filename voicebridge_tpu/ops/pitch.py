"""Pitch features: NCCF + Viterbi pitch tracking + POV.

Counterpart of the reference's ``compute-kaldi-pitch-feats`` /
``process-kaldi-pitch-feats`` (``feat/pitch-functions.h``; pipeline
``scr/steps/make_mfcc_pitch.cpp``).  Same architecture as the Kaldi pitch
tracker (Ghahremani et al. 2014) in a compact form:

1. per frame, the Normalized Cross-Correlation Function (NCCF) over the lag
   range for [min_f0, max_f0];
2. Viterbi smoothing over lag candidates with a log-lag transition penalty;
3. outputs per frame: (pov_feature, normalized-log-pitch, delta-pitch) —
   the 3 columns the reference pastes onto MFCCs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class PitchOptions:
    samp_freq: float = 16000.0
    frame_shift_ms: float = 10.0
    frame_length_ms: float = 25.0
    min_f0: float = 60.0
    max_f0: float = 400.0
    penalty_factor: float = 0.1
    pov_scale: float = 2.0
    norm_window_frames: int = 151  # sliding CMN window for log-pitch


def compute_nccf(wave: np.ndarray, opts: PitchOptions):
    """-> (nccf [T, L], lags [L])."""
    sr = opts.samp_freq
    shift = int(sr * opts.frame_shift_ms / 1000.0)
    wlen = int(sr * opts.frame_length_ms / 1000.0)
    min_lag = int(sr / opts.max_f0)
    max_lag = int(sr / opts.min_f0)
    lags = np.arange(min_lag, max_lag + 1)
    need = wlen + max_lag
    t = max((len(wave) - need) // shift + 1, 0)
    if t == 0:
        return np.zeros((0, len(lags))), lags
    x = wave.astype(np.float64)
    frames = np.stack([x[i * shift: i * shift + need] for i in range(t)])
    base = frames[:, :wlen]
    base = base - base.mean(axis=1, keepdims=True)
    e0 = (base * base).sum(axis=1) + 1e-10
    nccf = np.zeros((t, len(lags)))
    for j, lag in enumerate(lags):
        shifted = frames[:, lag: lag + wlen]
        shifted = shifted - shifted.mean(axis=1, keepdims=True)
        e1 = (shifted * shifted).sum(axis=1) + 1e-10
        nccf[:, j] = (base * shifted).sum(axis=1) / np.sqrt(e0 * e1)
    # small short-lag tilt: breaks exact octave ties toward the true (higher)
    # F0 — the role of Kaldi's lag-dependent ballast
    tilt = 1.0 - 0.02 * (lags - lags[0]) / max(lags[-1] - lags[0], 1)
    nccf = nccf * tilt[None, :]
    return nccf, lags


def viterbi_pitch(nccf: np.ndarray, lags: np.ndarray, opts: PitchOptions):
    """Smooth lag track: maximize sum NCCF - penalty * (delta log lag)^2."""
    t, l = nccf.shape
    if t == 0:
        return np.zeros(0, np.int64)
    log_lags = np.log(lags.astype(np.float64))
    dl = log_lags[None, :] - log_lags[:, None]
    trans = -opts.penalty_factor * (dl * dl) * 100.0
    score = nccf[0].copy()
    bp = np.zeros((t, l), np.int64)
    for i in range(1, t):
        cand = score[:, None] + trans  # [prev, cur]
        bp[i] = np.argmax(cand, axis=0)
        score = cand[bp[i], np.arange(l)] + nccf[i]
    track = np.zeros(t, np.int64)
    track[-1] = int(np.argmax(score))
    for i in range(t - 1, 0, -1):
        track[i - 1] = bp[i, track[i]]
    return track


def compute_pitch_feats(wave: np.ndarray, opts: PitchOptions) -> np.ndarray:
    """-> [T, 3] = (pov_feature, normalized log pitch, delta pitch)."""
    nccf, lags = compute_nccf(wave, opts)
    t = nccf.shape[0]
    if t == 0:
        return np.zeros((0, 3), np.float32)
    track = viterbi_pitch(nccf, lags, opts)
    best_nccf = nccf[np.arange(t), track]
    f0 = opts.samp_freq / lags[track]
    log_pitch = np.log(np.maximum(f0, 1.0))
    # sliding-window mean subtraction (process-kaldi-pitch-feats behavior)
    half = opts.norm_window_frames // 2
    norm = np.zeros(t)
    for i in range(t):
        lo, hi = max(0, i - half), min(t, i + half + 1)
        norm[i] = log_pitch[i] - log_pitch[lo:hi].mean()
    delta = np.zeros(t)
    delta[1:] = log_pitch[1:] - log_pitch[:-1]
    # POV (probability-of-voicing) feature from NCCF (monotone transform)
    c = np.clip(best_nccf, -1.0, 1.0)
    pov = opts.pov_scale * (1.0 / (1.0 + np.exp(-8.0 * (np.abs(c) - 0.5))) - 0.5)
    return np.stack([pov, norm, delta], axis=1).astype(np.float32)


def paste_feats(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """paste-feats: column-concatenate, truncating to the shorter length."""
    t = min(a.shape[0], b.shape[0])
    return np.concatenate([a[:t], b[:t]], axis=1)
