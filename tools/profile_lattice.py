"""Phase-level timing of the lattice-generating decode on the real chip.

Splits decode_lattice's cost into: loglikes, FB phase-1 forward (snapshots),
FB phase-2 backward (beta relax + gamma + sparsify), mask fetch, host
assembly, and the dense-refetch path, at a given (B, T).

Usage: python tools/profile_lattice.py [B] [T] [mode]   mode: worst|real
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.bench_real_graph import (graph_walk_feats, load_or_build,
                                    make_decoder, model_feats)  # noqa: E402
from voicebridge_tpu.ops import lattice as LAT  # noqa: E402
from voicebridge_tpu.ops.viterbi import NEG_INF  # noqa: E402


def _sync(r):
    for x in jax.tree.leaves(r):
        if hasattr(x, "dtype"):
            np.asarray(x.ravel()[:1].astype(jnp.float32))


def timeit(fn, iters=2):
    fn()
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        _sync(r)
    return (time.perf_counter() - t0) / iters


def main(b=32, t=500, mode="worst"):
    hclg, tm, tree, _lang = load_or_build()
    decoder, am, dim = make_decoder(hclg, tm, tree)
    g, plan = decoder.graph, decoder.plan
    _p, fwd_dev, bwd_plan, bwd_dev, row_dst = LAT.build_lattice_plans(
        g, fwd_plan=plan)
    rng = np.random.default_rng(2)
    feats = (model_feats(am, b, t, rng) if mode == "worst"
             else graph_walk_feats(g, am, b, t, rng))
    nf_np = np.full(b, t, np.int32)
    window = decoder._lattice_window(t)
    t_pad = -(-t // 128) * 128
    if t_pad != t:
        feats = np.concatenate(
            [feats, np.zeros((b, t_pad - t, dim), np.float32)], axis=1)
    print(f"B={b} T={t} window={window} mode={mode} "
          f"R={plan.num_rows} nbytes={-(-plan.num_rows * plan.d // 8)}")

    ll = decoder._loglikes(jnp.asarray(feats))
    jax.block_until_ready(ll)
    nf = jnp.asarray(nf_np)
    acwt = jnp.float32(decoder.opts.acoustic_scale)
    s1 = plan.num_states + 1
    ll_t = jnp.transpose(ll, (1, 2, 0))

    alpha0_col = jnp.concatenate(
        [jnp.asarray(g.alpha0[plan.sperm[:-1]]),
         jnp.full((1,), NEG_INF, jnp.float32)])
    nw = t_pad // window

    def phase1():
        alpha = jnp.broadcast_to(alpha0_col[:, None], (s1, b))
        at_end = jnp.full((s1, b), NEG_INF)
        snaps = []
        for w in range(nw):
            snaps.append(alpha)
            alpha, at_end = LAT._fb_win_forward(
                fwd_dev, alpha, at_end, ll_t[w * window:(w + 1) * window],
                jnp.int32(w * window), nf, acwt, plan.rspec)
        return snaps, at_end

    t_p1 = timeit(lambda: phase1())
    print(f"phase1 fwd:      {t_p1*1e3:8.1f} ms")

    snaps, at_end = phase1()
    final_col_bwd = jnp.concatenate(
        [jnp.asarray(g.final_score[bwd_plan.sperm[:-1]]),
         jnp.full((1,), NEG_INF, jnp.float32)])
    final_col_fwd = jnp.concatenate(
        [jnp.asarray(g.final_score[plan.sperm[:-1]]),
         jnp.full((1,), NEG_INF, jnp.float32)])
    with_final = jnp.max(at_end + final_col_fwd[:, None], axis=0)
    use_final = with_final > NEG_INF / 2
    total_best = jnp.where(use_final, with_final, jnp.max(at_end, axis=0))
    final_eff = jnp.where(use_final[None, :], final_col_bwd[:, None],
                          jnp.zeros((s1, b)))
    thresh = total_best - jnp.float32(decoder.opts.lattice_beam)
    row_dst_j = jnp.asarray(row_dst)
    budget = window * 1024

    def phase2(mask_budget):
        beta = jnp.full((s1, b), NEG_INF)
        outs = []
        for w in range(nw - 1, -1, -1):
            beta, out = LAT._fb_win_backward(
                fwd_dev, bwd_dev, row_dst_j, snaps[w], beta,
                ll_t[w * window:(w + 1) * window], jnp.int32(w * window),
                nf, final_eff, thresh, acwt, plan.rspec, bwd_plan.rspec,
                mask_budget)
            outs.append(out)
        return outs

    t_p2s = timeit(lambda: phase2(budget))
    print(f"phase2 (sparse): {t_p2s*1e3:8.1f} ms")
    t_p2d = timeit(lambda: phase2(None))
    print(f"phase2 (dense):  {t_p2d*1e3:8.1f} ms")

    outs = phase2(budget)
    t_fetch0 = time.perf_counter()
    fetched = [jax.tree.map(np.asarray, o) for o in outs]
    t_fetch = time.perf_counter() - t_fetch0
    counts = np.stack([c for (_i, _v, c) in fetched])  # [nw, B]
    print(f"sparse fetch:    {t_fetch*1e3:8.1f} ms  "
          f"(count max {counts.max()} budget {budget}, "
          f"mean {counts.mean():.0f})")

    outs_d = phase2(None)
    t_fd0 = time.perf_counter()
    dense_np = [np.asarray(o) for o in outs_d]
    t_fd = time.perf_counter() - t_fd0
    mb = sum(x.nbytes for x in dense_np) / 1e6
    print(f"dense fetch:     {t_fd*1e3:8.1f} ms  ({mb:.0f} MB)")

    def full():
        return decoder.decode_lattice([f"u{i}" for i in range(b)],
                                      feats[:, :t], nf_np)

    t_full = timeit(full, iters=1)
    audio = b * t * 0.01
    print(f"decode_lattice:  {t_full*1e3:8.1f} ms -> {audio/t_full:.1f} "
          f"audio-s/s")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    mode = sys.argv[3] if len(sys.argv) > 3 else "worst"
    main(b, t, mode)
