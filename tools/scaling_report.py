"""Scaling report: decode + train EM throughput vs mesh size (SCALING.md).

BASELINE.md's scaling-report row asks for audio-seconds/s at 1 chip, 1 host,
and >=2 hosts for train AND decode.  Multi-chip TPU hardware is not reachable
from this environment (one real chip via the axon tunnel), so this tool
measures the thing that IS testable here — that the sharded programs scale —
on a virtual CPU mesh (1/2/4/8 devices, weak scaling: fixed per-device batch),
and combines it with the real-chip absolute numbers from bench.py.

Each mesh size runs in its own subprocess because a JAX backend's device
count is fixed at initialization.

Usage: python tools/scaling_report.py [--out SCALING.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def child(n: int) -> None:
    """Measure sharded decode + train-EM throughput on an n-device CPU mesh
    (weak scaling: per-device batch is constant).  Prints one JSON line."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    import time

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, str(REPO))
    import bench as BE
    from voicebridge_tpu.ops import decode_core as DC
    from voicebridge_tpu.ops import gmm_kernels as K
    from voicebridge_tpu.ops import viterbi as V
    from voicebridge_tpu.models.gmm import AmDiagGmm
    from voicebridge_tpu.parallel import mesh as M
    from voicebridge_tpu.steps.align import AlignmentSet

    assert len(jax.devices()) == n, (n, jax.devices())
    mesh = M.make_mesh(num_data=n)
    rng = np.random.default_rng(0)
    num_pdfs, max_mix, dim = 200, 3, 39
    am = AmDiagGmm(
        rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32),
        np.abs(rng.standard_normal((num_pdfs, max_mix, dim))).astype(
            np.float32) + 0.5,
        np.full((num_pdfs, max_mix), 1.0 / max_mix, np.float32))
    params = M.replicate(mesh, K.pack_gmm(am))

    # ---- decode: replicated graph plan, batch sharded over `data` ----
    per_dev_b, t = 8, 100
    b = per_dev_b * n
    arc_src, arc_dst, arc_pdf, arc_score, alpha0 = BE.synth_decode_graph(
        num_states=2000, num_pdfs=num_pdfs)
    graph = V.DenseGraph(
        num_states=2000, arc_src=arc_src, arc_dst=arc_dst, arc_tid=arc_pdf,
        arc_pdf=arc_pdf, arc_score=arc_score,
        arc_oseq=np.zeros_like(arc_src), alpha0=alpha0,
        start_oseq=np.zeros(2000, np.int32),
        final_score=np.zeros(2000, np.float32),
        final_oseq=np.zeros(2000, np.int32), oseqs=[()])
    plan = DC.build_emit_plan(graph, d=8)
    dev = jax.tree.map(lambda x: jax.device_put(
        x, NamedSharding(mesh, P())), DC.plan_to_device(plan))
    feats = jax.device_put(
        rng.standard_normal((b, t, dim)).astype(np.float32),
        NamedSharding(mesh, P(M.DATA_AXIS)))
    nf = jax.device_put(np.full(b, t, np.int32),
                        NamedSharding(mesh, P(M.DATA_AXIS)))

    s1 = plan.num_states + 1
    alpha0_j = jnp.concatenate(
        [jnp.asarray(graph.alpha0[plan.sperm[:-1]]),
         jnp.full((1,), V.NEG_INF, jnp.float32)])
    alpha = jax.device_put(
        np.broadcast_to(np.asarray(alpha0_j)[:, None], (s1, b)).copy(),
        NamedSharding(mesh, P(None, M.DATA_AXIS)))
    ae0 = jax.device_put(np.full((s1, b), V.NEG_INF, np.float32),
                         NamedSharding(mesh, P(None, M.DATA_AXIS)))

    def decode_once():
        ll = K.loglikes_batch(params, feats)
        (a, ae), bps = DC.viterbi_scan(
            dev, alpha, ae0, ll, nf, jnp.int32(0), jnp.float32(0.1),
            jnp.float32(0.0), plan.rspec, plan.packed, False)
        jax.block_until_ready((a, ae))

    decode_once()
    it = 3
    t0 = time.perf_counter()
    for _ in range(it):
        decode_once()
    dec_wall = (time.perf_counter() - t0) / it
    dec_thru = b * t * 0.01 / dec_wall

    # ---- train EM step: psum-reduced stats over the data axis (banded
    # production kernel, ops/align_band.py) ----
    from voicebridge_tpu.ops import align_band as AB

    s_graph = 64
    graphs = [BE.synth_train_graph(s_graph, num_pdfs, rng) for _ in range(b)]
    band = AB.build_band_plan(graphs)
    assert band is not None, "synthetic training graphs should be banded"
    bb = M.shard_batch(mesh, dict(W=band.W, pdf=band.pdf,
                                  alpha0=band.alpha0))
    tids = np.zeros((b, t), np.int32)
    data = M.shard_batch(mesh, dict(
        feats=np.asarray(feats), num_frames=np.asarray(nf), tids=tids,
        pdf_ids=rng.integers(0, num_pdfs, (b, t)).astype(np.int32),
        weights=np.ones((b, t), np.float32)))
    step = M.em_estep_sharded_banded(mesh, num_pdfs, 1, band.offsets)

    def train_once():
        out = step(params, bb["W"], bb["pdf"], bb["alpha0"], data["feats"],
                   data["num_frames"], data["tids"], data["pdf_ids"],
                   data["weights"], jnp.float32(0.1))
        jax.block_until_ready(out)

    train_once()
    t0 = time.perf_counter()
    for _ in range(it):
        train_once()
    train_wall = (time.perf_counter() - t0) / it
    train_thru = b * t * 0.01 / train_wall

    print(json.dumps({
        "n": n, "batch": b,
        "decode_audio_s_per_s": round(dec_thru, 2),
        "train_audio_s_per_s": round(train_thru, 2),
    }), flush=True)


def main() -> None:
    if os.environ.get("VB_SCALING_CHILD"):
        child(int(os.environ["VB_SCALING_CHILD"]))
        return
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(REPO / "SCALING.md"))
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--bench", default=str(REPO / "bench_out_r5.json"),
                    help="bench.py output JSON (real-chip absolute numbers)")
    ap.add_argument("--rows-cache", default=None,
                    help="read/write the virtual-mesh rows here (lets the "
                    "CPU table and the real-chip bench run at different "
                    "times without repeating either)")
    args = ap.parse_args()

    rows = []
    if args.rows_cache and Path(args.rows_cache).exists():
        rows = [json.loads(l) for l in
                Path(args.rows_cache).read_text().splitlines() if l]
        print(f"loaded {len(rows)} cached mesh rows", flush=True)
    if not rows:
        for n in [int(x) for x in args.sizes.split(",")]:
            env = dict(os.environ, VB_SCALING_CHILD=str(n))
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, timeout=1800)
            line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
            if not line:
                print(f"mesh size {n} failed:\n{proc.stderr[-2000:]}",
                      file=sys.stderr)
                sys.exit(1)
            rec = json.loads(line[-1])
            rows.append(rec)
            print(rec, flush=True)
        if args.rows_cache:
            Path(args.rows_cache).write_text(
                "\n".join(json.dumps(r) for r in rows) + "\n")

    base = rows[0]
    bench_path = Path(args.bench)
    real = None
    if bench_path.exists():
        for l in bench_path.read_text().splitlines():
            if l.startswith("{"):
                real = json.loads(l)

    lines = [
        "# SCALING — audio-seconds/s vs mesh size",
        "",
        "BASELINE.md asks for train + decode audio-s/s at 1 chip, 1 host and",
        ">=2 hosts.  One real TPU v5e chip is reachable here (absolute",
        "numbers below); multi-chip runs on a **virtual CPU mesh** (weak",
        "scaling, fixed per-device batch) prove the sharded programs scale —",
        "the same `shard_map`/`psum` programs run unchanged on a real",
        "multi-chip `Mesh`, with collectives riding ICI (within a host) or",
        "DCN (across hosts); only the axis size changes.",
        "",
        "## Real TPU v5e, 1 chip (bench.py)",
        "",
    ]
    if real and not real.get("error"):
        lines += [
            f"- decode: **{real['value']} audio-s/s** "
            f"({real['vs_baseline']}x the >=100 north-star target) at "
            f"{real['config']}",
        ]
        tr = real.get("train_audio_seconds_per_sec_1chip")
        if tr:
            lines += [f"- train EM: **{tr} audio-s/s** at "
                      f"{real.get('train_config')}"]
        for key, label in (
                ("real_hclg_best_path", "real-HCLG decode (best path)"),
                ("real_hclg_lattice", "real-HCLG decode (lattice, "
                 "worst-case density)"),
                ("real_hclg_lattice_realistic",
                 "real-HCLG decode (lattice, realistic density)")):
            v = real.get(f"{key}_audio_seconds_per_sec_1chip")
            if v:
                lines += [f"- {label}: **{v} audio-s/s** at "
                          f"{real.get(f'{key}_config')}"]
        prov = real.get("provenance")
        if prov:
            lines += ["", f"Measured at commit `{prov.get('git')}` "
                      f"({prov.get('utc')}); the driver re-captures the "
                      "same bench as BENCH_r{N}.json each round."]
    else:
        lines += [f"- ({bench_path.name} missing or degraded; see the "
                  "driver's BENCH_r*.json)"]
    lines += [
        "",
        "## Virtual mesh weak scaling (CPU devices, per-device batch fixed)",
        "",
        "| devices | batch | decode audio-s/s | decode efficiency | "
        "train audio-s/s | train efficiency |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        de = r["decode_audio_s_per_s"] / (base["decode_audio_s_per_s"] * r["n"])
        te = r["train_audio_s_per_s"] / (base["train_audio_s_per_s"] * r["n"])
        lines.append(
            f"| {r['n']} | {r['batch']} | {r['decode_audio_s_per_s']} | "
            f"{de:.2f} | {r['train_audio_s_per_s']} | {te:.2f} |")
    ncpu = os.cpu_count() or 1
    lines += [
        "",
        "Efficiency = throughput / (devices x 1-device throughput); 1.0 is",
        f"perfect weak scaling.  NOTE: this host has **{ncpu} physical",
        "cores**, so n virtual devices time-slice them and the measurable",
        f"efficiency ceiling is min(1, {ncpu}/n) = "
        + ", ".join(f"{min(1.0, ncpu / r['n']):.2f}@{r['n']}" for r in rows)
        + " — efficiency at the ceiling means the sharded program itself",
        "adds no overhead (perfect scaling up to the physical parallelism",
        "available).  Decode shards utterances over the `data`",
        "axis with the graph plan replicated (no cross-device communication",
        "in the hot loop); train adds one `psum` of the EM sufficient",
        "statistics per step (`parallel/mesh.py em_estep_sharded`), the",
        "TPU-native replacement for the reference's per-job accumulator",
        "files + `GmmSumAccs` reduction (SURVEY.md §2.6 P1/P2).  Round 5",
        "extended the psum paths to the LDA/MLLT/fMLLR/tree accumulators",
        "(`acc_*_stats_sharded`) and the multichip dryrun to the lattice +",
        "fMLLR decode path.",
        "",
        "## Environment sensitivity (driver-vs-builder deltas, round 5)",
        "",
        "The remote-TPU tunnel's host<->device bandwidth was MEASURED to",
        "swing between ~4.9 and ~21 MB/s within one session (round 5,",
        "tools/profile_lattice.py methodology), and a tiny-fetch round trip",
        "costs ~55 ms.  Fetch-bound paths (lattice survivor masks; any",
        "per-iteration host reads) therefore vary up to ~2x run-to-run,",
        "which explains the round-4 builder-vs-driver gaps (205 vs 156.7",
        "best-path; 35.2 vs 21.39 realistic-lattice) without any code",
        "difference.  The round-4 train-EM 'halving' (3337 -> 1662) had a",
        "real component on top of this: the bench measured a non-production",
        "accumulator and re-uploaded the alignment band plan every",
        "iteration (both fixed round 5 — commit 52905b2: train 3642",
        "re-measured).  The round-5 decode work removed the largest",
        "fetch-bound terms (deferred count-first sparse fetch; acoustic",
        "costs gathered on device instead of a 258 MB loglik fetch), which",
        "both speeds the path up and shrinks its bandwidth sensitivity.",
        "",
    ]
    Path(args.out).write_text("\n".join(lines))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
