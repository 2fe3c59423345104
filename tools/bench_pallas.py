"""Microbench: Pallas fused kernels vs the XLA paths on the real chip.

Usage: python tools/bench_pallas.py [gmm|mfcc|all]

The mfcc bench sweeps dispatch sizes: the XLA rfft path wins small
dispatches, the fused kernel wins corpus-scale ones (2.3x at 262k frames);
steps/make_feats.py size-gates on the measured crossover.
Writes one JSON line per comparison (also persisted by the caller into
BENCH_PALLAS.json for the record).
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from voicebridge_tpu.models.gmm import AmDiagGmm  # noqa: E402
from voicebridge_tpu.ops import gmm_kernels as K  # noqa: E402
from voicebridge_tpu.ops.pallas_gmm import (loglikes_batch_pallas,  # noqa: E402
                                            pack_gmm_pallas)


def timeit(fn, iters=5):
    r = fn()
    jax.block_until_ready(r)
    _ = float(jnp.max(r if isinstance(r, jnp.ndarray) else r[0]))
    t0 = time.perf_counter()
    for _i in range(iters):
        r = fn()
    _ = float(jnp.max(r if isinstance(r, jnp.ndarray) else r[0]))
    return (time.perf_counter() - t0) / iters


def bench_gmm(b=128, t=1000, num_pdfs=2000, max_mix=5, dim=39):
    rng = np.random.default_rng(1)
    am = AmDiagGmm(
        rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32),
        np.abs(rng.standard_normal((num_pdfs, max_mix, dim))).astype(
            np.float32) + 0.5,
        np.full((num_pdfs, max_mix), 1.0 / max_mix, np.float32))
    xla_p = K.pack_gmm(am)
    pal_p = pack_gmm_pallas(am)
    feats = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)

    t_xla = timeit(lambda: K.loglikes_batch(xla_p, feats))
    t_pal = timeit(lambda: loglikes_batch_pallas(pal_p, feats, num_pdfs))
    # parity on-chip
    a = np.asarray(K.loglikes_batch(xla_p, feats)[:2, :50])
    bb = np.asarray(loglikes_batch_pallas(pal_p, feats, num_pdfs)[:2, :50])
    err = float(np.max(np.abs(a - bb)))
    print(json.dumps({
        "kernel": "gmm_loglikes", "shape": f"[{b}x{t}]x{num_pdfs}x{max_mix}",
        "xla_ms": round(t_xla * 1e3, 2), "pallas_ms": round(t_pal * 1e3, 2),
        "speedup": round(t_xla / t_pal, 2), "max_abs_err": err,
    }), flush=True)


def bench_mfcc(nf=65536, sr=16000):
    from voicebridge_tpu.config import FrameOptions, MfccOptions
    from voicebridge_tpu.ops.features import MfccExtractor, extract_frames
    from voicebridge_tpu.ops.pallas_mfcc import MfccPallas

    fo = FrameOptions(samp_freq=float(sr), dither=0.0)
    opts = MfccOptions(frame_opts=fo)
    ref = MfccExtractor(opts)
    pal = MfccPallas(opts)
    rng = np.random.default_rng(2)
    # one long pseudo-wave chopped into frames
    ws, shift = fo.window_size, fo.window_shift
    wave = jnp.asarray(
        rng.standard_normal(nf * shift + ws).astype(np.float32) * 1000)
    frames = extract_frames(wave, nf, fo)
    jax.block_until_ready(frames)

    @jax.jit
    def xla_path(fr):
        from voicebridge_tpu.ops.features import mfcc_from_frames
        return mfcc_from_frames(fr, opts, ref.window, ref.mel_mat,
                                ref.dct_mat, ref.lifter, None)

    t_xla = timeit(lambda: xla_path(frames))
    t_pal = timeit(lambda: pal.frames_to_feats(frames))
    a = np.asarray(xla_path(frames)[:256])
    bb = np.asarray(pal.frames_to_feats(frames)[:256])
    err = float(np.max(np.abs(a - bb)))
    audio_s = nf * fo.frame_shift_ms / 1000.0
    print(json.dumps({
        "kernel": "mfcc", "frames": nf,
        "xla_ms": round(t_xla * 1e3, 2), "pallas_ms": round(t_pal * 1e3, 2),
        "speedup": round(t_xla / t_pal, 2), "max_abs_err": err,
        "pallas_audio_s_per_s": round(audio_s / t_pal, 1),
    }), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("gmm", "all"):
        bench_gmm()
    if which in ("mfcc", "all"):
        for nf in (16384, 65536, 262144):
            bench_mfcc(nf)
