"""Benchmark: decode throughput (audio-seconds per second) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north star): >= 100x real-time decode per v5e chip, so
vs_baseline = value / 100.

Workload: the decode hot path at LibriSpeech-like scale — batched diagonal-GMM
log-likelihoods (10k Gaussians, 39-dim, the DELTA+SAT model size) + the
arc-parallel Viterbi scan over an HCLG-scale graph (generated synthetically at
a representative state/arc count until the full LibriSpeech pipeline lands in
a later round).  10ms frame shift => 1 frame = 0.01 audio seconds.
"""

import json
import time

import numpy as np


def synth_decode_graph(num_states=60_000, arcs_per_state=8, num_pdfs=2000, seed=0):
    """Synthetic HCLG-shaped arc arrays: locally-branching transition
    structure with self-loops (like a real decode graph after self-loop
    expansion)."""
    rng = np.random.default_rng(seed)
    a = num_states * arcs_per_state
    arc_src = np.repeat(np.arange(num_states, dtype=np.int32), arcs_per_state)
    # mostly-local destinations, wrap-around
    jumps = rng.integers(1, 64, size=a).astype(np.int32)
    arc_dst = ((arc_src + jumps) % num_states).astype(np.int32)
    # one self-loop per state
    arc_dst[::arcs_per_state] = arc_src[::arcs_per_state]
    arc_pdf = rng.integers(0, num_pdfs, size=a).astype(np.int32)
    arc_score = (-rng.exponential(1.0, size=a)).astype(np.float32)
    alpha0 = np.full(num_states, -1e30, np.float32)
    alpha0[0] = 0.0
    return arc_src, arc_dst, arc_pdf, arc_score, alpha0


def main():
    import jax
    import jax.numpy as jnp

    from voicebridge_tpu.models.gmm import AmDiagGmm
    from voicebridge_tpu.ops import gmm_kernels as K
    from voicebridge_tpu.ops import viterbi as V

    rng = np.random.default_rng(1)
    num_pdfs, max_mix, dim = 2000, 5, 39  # ~10k Gaussians (DELTA+SAT scale)
    am = AmDiagGmm(
        rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32),
        np.abs(rng.standard_normal((num_pdfs, max_mix, dim))).astype(np.float32) + 0.5,
        np.full((num_pdfs, max_mix), 1.0 / max_mix, np.float32),
    )
    params = K.pack_gmm(am)

    arc_src, arc_dst, arc_pdf, arc_score, alpha0 = synth_decode_graph(
        num_pdfs=num_pdfs)
    num_states = len(alpha0)

    b, t = 32, 1000  # 32 x 10s utterances per batch (throughput decoding)
    feats = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)
    num_frames = np.full((b,), t, np.int32)

    levels = tuple(jnp.asarray(l) for l in
                   V.build_reduction_plan(arc_dst, num_states, k=8).levels)
    graph = V.DenseGraph(
        num_states=num_states, arc_src=arc_src, arc_dst=arc_dst,
        arc_tid=arc_pdf, arc_pdf=arc_pdf, arc_score=arc_score,
        arc_oseq=np.zeros_like(arc_src),
        alpha0=alpha0, start_oseq=np.zeros(num_states, np.int32),
        final_score=np.zeros(num_states, np.float32),
        final_oseq=np.zeros(num_states, np.int32), oseqs=[()])

    def decode_full(feats, num_frames):
        ll = K.loglikes_batch(params, feats)
        return V.viterbi_decode_windowed(
            graph, levels, ll, num_frames,
            acoustic_scale=1.0 / 13.0, beam=200.0, window=50)

    # warmup / compile
    out = decode_full(feats, num_frames)
    assert all(len(r["arcs"]) == t for r in out), "bench decode found no path"

    iters = 3
    start = time.perf_counter()
    for _ in range(iters):
        out = decode_full(feats, num_frames)
    wall = (time.perf_counter() - start) / iters

    audio_seconds = b * t * 0.01
    value = audio_seconds / wall
    print(json.dumps({
        "metric": "decode_audio_seconds_per_sec_1chip",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(value / 100.0, 3),
    }))


if __name__ == "__main__":
    main()
