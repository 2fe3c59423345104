"""Component-level timing of the REAL-HCLG best-path decode on the chip.

Locates where the 22.5 s/iter (56.8 audio-s/s, round 3) goes at B=128
T=1000 on the 89,914-state mkgraph HCLG: loglikes, pass-1 forward
(no backpointers), pass-2 forward (with bp), device backtrace, host
assembly, and the end-to-end production path `Decoder.decode_batch`.

Usage: python tools/profile_real_decode.py [B] [T] [chunk]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from tools.bench_real_graph import load_or_build, make_decoder, model_feats  # noqa: E402
from voicebridge_tpu.ops import decode_core as DC  # noqa: E402
from voicebridge_tpu.ops import viterbi as V  # noqa: E402


def _sync(r):
    """block_until_ready is unreliable over the axon tunnel (returns before
    remote execution finishes); a scalar host fetch is a true barrier."""
    for x in jax.tree.leaves(r):
        if hasattr(x, "dtype"):
            np.asarray(x.ravel()[:1].astype(jnp.float32))


def timeit(fn, iters=3):
    fn()  # compile
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
        _sync(r)
    return (time.perf_counter() - t0) / iters


def main(b=128, t=1000, chunk=None):
    hclg, tm, tree, _lang = load_or_build()
    decoder, am, dim = make_decoder(hclg, tm, tree)
    plan, dev, graph = decoder.plan, decoder.plan_dev, decoder.graph
    if chunk is None:
        chunk = decoder._bp_chunk(b)
    print(f"B={b} T={t} S={graph.num_states} A={graph.num_arcs} "
          f"R={plan.num_rows} D={plan.d} packed={plan.packed} chunk={chunk} "
          f"rspec={plan.rspec}")
    rng = np.random.default_rng(2)
    feats = jnp.asarray(model_feats(am, b, t, rng))
    num_frames = np.full((b,), t, np.int32)
    nf = jnp.asarray(num_frames)
    audio = b * t * 0.01

    t_ll = timeit(lambda: decoder._loglikes(feats))
    print(f"loglikes:        {t_ll*1e3:8.1f} ms")
    ll = decoder._loglikes(feats)
    jax.block_until_ready(ll)

    s1 = plan.num_states + 1
    alpha0j = jnp.concatenate(
        [jnp.asarray(graph.alpha0[plan.sperm[:-1]]),
         jnp.full((1,), V.NEG_INF, jnp.float32)])
    alpha = jnp.broadcast_to(alpha0j[:, None], (s1, b))
    alpha_end = jnp.full((s1, b), V.NEG_INF)
    t_pad = -(-t // chunk) * chunk
    ll_pad = jnp.concatenate(
        [ll, jnp.zeros((b, t_pad - t, ll.shape[2]), ll.dtype)], axis=1) \
        if t_pad != t else ll

    def fwd(with_bp):
        """Pass-1 shape: snapshots kept, at most ONE chunk's bp resident."""
        a, ae = alpha, alpha_end
        snaps = []
        for lo in range(0, t_pad, chunk):
            snaps.append(a)
            (a, ae), bps = DC.viterbi_scan(
                dev, a, ae, ll_pad[:, lo:lo + chunk], nf, jnp.int32(lo),
                jnp.float32(1 / 13.0), jnp.float32(0.0), plan.rspec, plan.packed,
                False, with_bp=with_bp)
            del bps
        return (a, ae), snaps

    t_f1 = timeit(lambda: fwd(False))
    print(f"fwd (no bp):     {t_f1*1e3:8.1f} ms  ({t_f1/t*1e6:.1f} us/frame)")
    t_f2 = timeit(lambda: fwd(True))
    print(f"fwd (with bp):   {t_f2*1e3:8.1f} ms  ({t_f2/t*1e6:.1f} us/frame)")

    (_, ae), snaps = fwd(False)
    end_state = jnp.zeros((b,), jnp.int32)
    d = jnp.int32(plan.d)

    def pass2():
        """Recompute pass 2: per chunk, forward WITH bp then backtrace."""
        st = end_state
        outs = []
        for i in range(len(snaps) - 1, -1, -1):
            lo = i * chunk
            _, bps = DC.viterbi_scan(
                dev, snaps[i], snaps[i], ll_pad[:, lo:lo + chunk], nf,
                jnp.int32(lo), jnp.float32(1 / 13.0), jnp.float32(0.0),
                plan.rspec, plan.packed, False)
            codes, st = DC.backtrace_scan(dev.row_start, dev.row_src, d, bps,
                                          st, nf, jnp.int32(lo))
            del bps
            outs.append(np.asarray(codes))
        return outs

    t_bt = timeit(pass2)
    print(f"pass2+backtrace: {t_bt*1e3:8.1f} ms")

    def full_core():
        return DC.decode_best_path(graph, plan, dev, ll, num_frames,
                                   acoustic_scale=1 / 13.0, chunk=chunk)

    t_core = timeit(full_core)
    print(f"decode_best_path:{t_core*1e3:8.1f} ms -> "
          f"{audio/(t_core+t_ll):.1f} audio-s/s (incl loglikes)")

    utts = [f"u{i}" for i in range(b)]
    feats_np = np.asarray(feats)

    def full():
        return decoder.decode_batch(utts, feats_np, num_frames)

    t_full = timeit(full)
    print(f"decode_batch:    {t_full*1e3:8.1f} ms -> {audio/t_full:.1f} "
          f"audio-s/s")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else None
    main(b=b, t=t, chunk=chunk)
