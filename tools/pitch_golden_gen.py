"""Independent straight-from-the-formulas pitch implementation, used ONCE to
generate the golden vectors committed in tests/test_pitch_golden.py
(regen: python tools/pitch_golden_gen.py; it also cross-checks the
production chain against itself and prints the max deviations).

Deliberately different machinery from ops/pitch.py: per-frame/per-lag Python
loops, direct formula transcription (Ghahremani et al. 2014 + the published
Kaldi constants), no sliding_window_view / einsum / matrix-sinc tricks.
"""
import sys, math, time
import numpy as np
sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parent.parent))
from voicebridge_tpu.ops.pitch import (PitchOptions, ProcessPitchOptions,
                                       compute_kaldi_pitch, process_pitch)
from voicebridge_tpu.utils.wave import resample as repo_resample

O = PitchOptions()
P = ProcessPitchOptions()


def indep_select_lags(o):
    lags, lag = [], 1.0 / o.max_f0
    while lag <= 1.0 / o.min_f0:
        lags.append(lag)
        lag *= 1.0 + o.delta_pitch
    return lags


def indep_nccf(wave, o):
    rf = o.resample_freq
    ds = repo_resample(np.asarray(wave, np.float64), o.samp_freq, rf,
                       num_zeros=max(2 * o.lowpass_filter_width, 2))
    ds = np.asarray(ds, np.float64)
    lags = indep_select_lags(o)
    outer_min = 1.0 / o.max_f0 - o.upsample_filter_width / (2.0 * rf)
    outer_max = 1.0 / o.min_f0 + o.upsample_filter_width / (2.0 * rf)
    first = math.ceil(rf * outer_min)
    last = math.floor(rf * outer_max)
    wlen = int(rf * o.frame_length_ms / 1000.0)
    shift = int(rf * o.frame_shift_ms / 1000.0)
    full = wlen + last
    T = max((len(ds) - full) // shift + 1, 0)
    n = len(ds)
    mean_sq = float(np.mean(ds * ds) - np.mean(ds) ** 2)
    ballast = (mean_sq * wlen) ** 2 * o.nccf_ballast

    nccf_p = np.zeros((T, last - first + 1))
    nccf_v = np.zeros((T, last - first + 1))
    for t in range(T):
        fr = ds[t * shift: t * shift + full].copy()
        fr = fr - np.mean(fr[:wlen])
        base = fr[:wlen]
        e1 = float(np.dot(base, base))
        for j, lag in enumerate(range(first, last + 1)):
            sh = fr[lag: lag + wlen]
            inner = float(np.dot(base, sh))
            e2 = float(np.dot(sh, sh))
            nccf_p[t, j] = inner / math.sqrt(e1 * e2 + ballast) \
                if e1 * e2 + ballast > 0 else 0.0
            nccf_v[t, j] = inner / math.sqrt(e1 * e2) if e1 * e2 > 0 else 0.0
    # direct windowed-sinc interpolation onto the geometric lags
    cutoff = rf * 0.5
    nz = o.upsample_filter_width
    support = nz / (2.0 * cutoff)
    out_p = np.zeros((T, len(lags)))
    out_v = np.zeros((T, len(lags)))
    for li, lag_s in enumerate(lags):
        for j, ilag in enumerate(range(first, last + 1)):
            d = lag_s - ilag / rf
            if abs(d) >= support:
                continue
            win = 0.5 + 0.5 * math.cos(math.pi * d / support)
            if d == 0.0:
                tap = win * 2.0 * cutoff / rf
            else:
                tap = win * math.sin(2.0 * math.pi * cutoff * d) / (
                    math.pi * d) / rf
            out_p[:, li] += nccf_p[:, j] * tap
            out_v[:, li] += nccf_v[:, j] * tap
    return out_p, out_v, np.asarray(lags)


def indep_viterbi(nccf, lags, o):
    T, L = nccf.shape
    ifac = math.log(1.0 + o.delta_pitch) ** 2 * o.penalty_factor
    local = np.zeros((T, L))
    for t in range(T):
        for i in range(L):
            local[t, i] = 1.0 - nccf[t, i] * (1.0 - o.soft_min_f0 * lags[i])
    cost = local[0].copy()
    bp = np.zeros((T, L), np.int64)
    for t in range(1, T):
        nc = np.zeros(L)
        for i in range(L):
            best, bj = None, 0
            for j in range(L):
                c = cost[j] + (j - i) ** 2 * ifac
                if best is None or c < best:
                    best, bj = c, j
            nc[i] = best + local[t, i]
            bp[t, i] = bj
        cost = nc
    track = np.zeros(T, np.int64)
    track[-1] = int(np.argmin(cost))
    for t in range(T - 1, 0, -1):
        track[t - 1] = bp[t, track[t]]
    return track


def indep_raw_pitch(wave, o):
    np_, nv, lags = indep_nccf(wave, o)
    tr = indep_viterbi(np_, lags, o)
    T = np_.shape[0]
    out = np.zeros((T, 2))
    for t in range(T):
        out[t, 0] = nv[t, tr[t]]
        out[t, 1] = 1.0 / lags[tr[t]]
    return out


def indep_process(raw, p):
    T = raw.shape[0]
    nccf = raw[:, 0]
    logp = np.log(np.maximum(raw[:, 1], 1e-10))
    out = np.zeros((T, 3))
    for t in range(T):
        n = min(max(nccf[t], -1.0), 1.0)
        out[t, 0] = p.pov_scale * ((1.0001 - n) ** 0.15 - 1.0)
        lo = max(t - p.normalization_left_context, 0)
        hi = min(t + p.normalization_right_context + 1, T)
        wsum = psum = 0.0
        for u in range(lo, hi):
            nd = min(abs(nccf[u]), 1.0)
            r = (-5.2 + 5.4 * math.exp(7.5 * (nd - 1.0)) + 4.8 * nd
                 - 2.0 * math.exp(-10.0 * nd)
                 + 4.2 * math.exp(20.0 * (nd - 1.0)))
            pov = 1.0 / (1.0 + math.exp(-r))
            wsum += pov
            psum += pov * logp[u]
        out[t, 1] = p.pitch_scale * (logp[t] - psum / max(wsum, 1e-20))
        denom = 2.0 * sum(k * k for k in range(1, p.delta_window + 1))
        d = 0.0
        for k in range(1, p.delta_window + 1):
            d += k * (logp[min(t + k, T - 1)] - logp[max(t - k, 0)])
        out[t, 2] = p.delta_pitch_scale * (d / denom)  # noise-free
    return out


def make_waves():
    sr = 16000.0
    t = np.arange(int(sr * 0.6)) / sr
    rng = np.random.default_rng(123)
    tone = (0.5 * np.sin(2 * np.pi * 120.0 * t)
            + 0.05 * rng.standard_normal(len(t)))
    f = 100.0 + (200.0 - 100.0) * t / t[-1]
    chirp = (0.4 * np.sin(2 * np.pi * np.cumsum(f) / sr)
             + 0.05 * rng.standard_normal(len(t)))
    return {"tone120": tone * 8000, "chirp100_200": chirp * 8000}


if __name__ == "__main__":
    noise_free = ProcessPitchOptions(delta_pitch_noise_stddev=0.0)
    for name, wave in make_waves().items():
        t0 = time.time()
        raw_i = indep_raw_pitch(wave, O)
        proc_i = indep_process(raw_i, P)
        raw_r = compute_kaldi_pitch(wave, O)
        proc_r = process_pitch(raw_r, noise_free)
        # cross-check production vs independent
        dr = np.abs(raw_i - raw_r).max()
        dp = np.abs(proc_i - proc_r).max()
        print(f"{name}: frames {raw_i.shape[0]}, max|raw diff| {dr:.2e}, "
              f"max|proc diff| {dp:.2e}  ({time.time()-t0:.1f}s)")
        sub = list(range(0, raw_i.shape[0], 7))
        np.set_printoptions(precision=6, suppress=False, linewidth=100)
        print(f"GOLDEN {name} frames={sub}")
        print(repr(np.round(proc_r[sub], 6)))
