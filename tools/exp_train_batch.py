"""Experiment: train-EM throughput vs batch size on the real chip.

The round-2 train bench number (70.97 audio-s/s at b=96,t=400,s=384) is
suspected to be scan-latency-bound: the per-utterance training graphs are
tiny (~384 states), so each of the T sequential scan steps does very little
work and fixed per-step overhead dominates.  If so, throughput should rise
nearly linearly with batch until the relaxation fills the chip.

Usage: python tools/exp_train_batch.py [b ...]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def run(b, t=400, s=384):
    import jax
    import jax.numpy as jnp

    from voicebridge_tpu.models.gmm import AmDiagGmm
    from voicebridge_tpu.ops import gmm_kernels as K
    from voicebridge_tpu.ops.pallas_gmm import (loglikes_batch_pallas,
                                                pack_gmm_pallas)
    from voicebridge_tpu.steps.align import AlignmentSet

    rng = np.random.default_rng(3)
    num_pdfs, max_mix, dim = 2000, 5, 39
    am = AmDiagGmm(
        rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32),
        np.abs(rng.standard_normal((num_pdfs, max_mix, dim))).astype(
            np.float32) + 0.5,
        np.full((num_pdfs, max_mix), 1.0 / max_mix, np.float32))
    params_p = pack_gmm_pallas(am)
    params = K.pack_gmm(am)
    graphs = [bench.synth_train_graph(s, num_pdfs, rng) for _ in range(b)]
    aset = AlignmentSet(graphs)
    feats = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)
    nf = np.full((b,), t, np.int32)

    stages = {}

    def em_iter(timeit=False):
        t0 = time.perf_counter()
        ll = loglikes_batch_pallas(params_p, feats, num_pdfs)
        jax.block_until_ready(ll)
        t1 = time.perf_counter()
        alis = aset.align(ll, nf, acoustic_scale=0.1)
        t2 = time.perf_counter()
        pdf_ids = np.zeros((b, t), np.int32)
        for i, r in enumerate(alis):
            pdf_ids[i] = graphs[i].arc_pdf[r["arcs"]]
        t3 = time.perf_counter()
        stats = K.acc_gmm_stats(params, feats.reshape(-1, dim),
                                jnp.asarray(pdf_ids).reshape(-1), num_pdfs)
        jax.block_until_ready(stats)
        t4 = time.perf_counter()
        if timeit:
            for k, v in zip(("loglik", "align", "host_pdf", "estep"),
                            (t1 - t0, t2 - t1, t3 - t2, t4 - t3)):
                stages[k] = stages.get(k, 0.0) + v

    em_iter()  # compile
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        em_iter(timeit=True)
    wall = (time.perf_counter() - t0) / iters
    for k in stages:
        stages[k] = round(stages[k] / iters, 3)
    print(json.dumps({
        "b": b, "t": t, "s": s,
        "audio_s_per_s": round(b * t * 0.01 / wall, 2),
        "wall_per_iter": round(wall, 3), "stages": stages}), flush=True)


if __name__ == "__main__":
    bs = [int(x) for x in sys.argv[1:]] or [96, 256, 512]
    for b in bs:
        run(b)
