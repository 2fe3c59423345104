"""Component-level timing of the decode hot path on the real chip.

Measures (a) GMM loglikes, (b) forward viterbi_scan, (c) backtrace, and the
end-to-end decode_best_path, at several batch sizes, to locate the bottleneck
vs the 100 audio-s/s target.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import synth_decode_graph  # noqa: E402
from voicebridge_tpu.models.gmm import AmDiagGmm  # noqa: E402
from voicebridge_tpu.ops import decode_core as DC  # noqa: E402
from voicebridge_tpu.ops import gmm_kernels as K  # noqa: E402
from voicebridge_tpu.ops import viterbi as V  # noqa: E402


def _sync(r):
    """block_until_ready is unreliable over the axon tunnel (returns before
    remote execution finishes); a scalar host fetch is a true barrier."""
    leaves = jax.tree.leaves(r)
    for x in leaves:
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


def main(b=32, t=1000, num_states=60_000, chunk=500):
    rng = np.random.default_rng(1)
    num_pdfs, max_mix, dim = 2000, 5, 39
    am = AmDiagGmm(
        rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32),
        np.abs(rng.standard_normal((num_pdfs, max_mix, dim))).astype(np.float32) + 0.5,
        np.full((num_pdfs, max_mix), 1.0 / max_mix, np.float32),
    )
    params = K.pack_gmm(am)
    arc_src, arc_dst, arc_pdf, arc_score, alpha0 = synth_decode_graph(
        num_states=num_states, num_pdfs=num_pdfs)
    graph = V.DenseGraph(
        num_states=num_states, arc_src=arc_src, arc_dst=arc_dst,
        arc_tid=arc_pdf, arc_pdf=arc_pdf, arc_score=arc_score,
        arc_oseq=np.zeros_like(arc_src),
        alpha0=alpha0, start_oseq=np.zeros(num_states, np.int32),
        final_score=np.zeros(num_states, np.float32),
        final_oseq=np.zeros(num_states, np.int32), oseqs=[()])
    plan = DC.build_emit_plan(graph, d=8)
    dev = DC.plan_to_device(plan)
    print(f"B={b} T={t} S={num_states} R={plan.num_rows} D={plan.d} "
          f"packed={plan.packed}")
    feats = jnp.asarray(rng.standard_normal((b, t, dim)), jnp.float32)
    num_frames = np.full((b,), t, np.int32)
    nf = jnp.asarray(num_frames)

    ll = K.loglikes_batch(params, feats)
    jax.block_until_ready(ll)
    t_ll = timeit(lambda: K.loglikes_batch(params, feats))
    print(f"loglikes:  {t_ll*1e3:8.1f} ms")

    s1 = plan.num_states + 1
    alpha0j = jnp.concatenate(
        [jnp.asarray(graph.alpha0), jnp.full((1,), V.NEG_INF, jnp.float32)])
    alpha = jnp.broadcast_to(alpha0j[:, None], (s1, b))
    alpha_end = jnp.full((s1, b), V.NEG_INF)

    def fwd():
        a, ae = alpha, alpha_end
        outs = []
        for lo in range(0, t, chunk):
            (a, ae), bps = DC.viterbi_scan(
                dev, a, ae, ll[:, lo:lo + chunk], nf, jnp.int32(lo),
                jnp.float32(1 / 13.0), jnp.float32(0.0), plan.rspec, plan.packed, False)
            outs.append(bps)
        return outs

    t_fwd = timeit(fwd)
    print(f"fwd scan:  {t_fwd*1e3:8.1f} ms  ({t_fwd/t*1e6:.1f} us/frame)")

    bps_chunks = fwd()
    end_state = jnp.zeros((b,), jnp.int32)
    d = jnp.int32(plan.d)

    def bt():
        st = end_state
        outs = []
        for i, bps in enumerate(reversed(bps_chunks)):
            lo = t - (i + 1) * chunk
            codes, st = DC.backtrace_scan(dev.row_start, dev.row_src, d, bps,
                                          st, nf, jnp.int32(lo))
            outs.append(codes)
        return outs

    t_bt = timeit(bt)
    print(f"backtrace: {t_bt*1e3:8.1f} ms")

    def full():
        ll2 = K.loglikes_batch(params, feats)
        return DC.decode_best_path(graph, plan, dev, ll2, num_frames,
                                   acoustic_scale=1 / 13.0, chunk=chunk)

    t_full = timeit(full)
    audio = b * t * 0.01
    print(f"full:      {t_full*1e3:8.1f} ms -> {audio/t_full:.1f} audio-s/s")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    chunk = int(sys.argv[3]) if len(sys.argv) > 3 else 500
    main(b=b, t=t, chunk=chunk)
