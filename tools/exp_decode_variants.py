"""Experiment: per-frame Viterbi relaxation formulations on the real TPU.

Measures seconds/frame for several candidate kernel designs at bench scale
(S=60k states, A=480k arcs, B=32, P=2000 pdfs) to decide the round-2 decoder
design. Run: python tools/exp_decode_variants.py [variant ...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

S = 60_000
D = 8          # in-degree (exact by construction here)
B = 32
T = 100
P = 2000
ACWT = 1.0 / 13.0
NEG_INF = -1.0e30


def make_graph(seed=0):
    """Graph with exactly D incoming arcs per state: dst = (src + delta_k) % S
    for D fixed random deltas (delta_0 = 0 self-loop)."""
    rng = np.random.default_rng(seed)
    deltas = np.concatenate([[0], rng.integers(1, 64, size=D - 1)]).astype(np.int64)
    # in-degree layout: for state s, incoming slot k has src = (s - deltas[k]) % S
    src_sd = ((np.arange(S)[:, None] - deltas[None, :]) % S).astype(np.int32)  # [S, D]
    w_sd = (-rng.exponential(1.0, size=(S, D))).astype(np.float32)
    pdf_state = rng.integers(0, P, size=S).astype(np.int32)  # state-emitting form
    return deltas, src_sd, w_sd, pdf_state


def bench(fn, alpha0, lls, name, iters=3):
    out = fn(alpha0, lls)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(alpha0, lls)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    per_frame = dt / T
    # audio-s/s if this were the whole decode: B utterances advance together
    aps = B * 0.01 / per_frame
    print(f"{name:28s} {dt*1e3:9.1f} ms/scan  {per_frame*1e6:9.1f} us/frame  "
          f"-> {aps:9.1f} audio-s/s", flush=True)
    return out


def main():
    want = set(sys.argv[1:]) or {"v1", "v2", "v3", "v2b"}
    deltas, src_sd, w_sd, pdf_state = make_graph()
    rng = np.random.default_rng(1)

    print(f"device: {jax.devices()}", flush=True)

    if "v1" in want:
        # V1: round-1 style — lane-major alpha [B, S], flat arc gather [B, A]
        arc_src = src_sd.reshape(-1)
        arc_w = w_sd.reshape(-1)
        arc_pdf = np.repeat(pdf_state, D)
        from voicebridge_tpu.ops.viterbi import build_reduction_plan
        plan = build_reduction_plan(
            np.repeat(np.arange(S, dtype=np.int32), D), S, k=8)
        levels = tuple(jnp.asarray(l) for l in plan.levels)
        arc_src_j = jnp.asarray(arc_src)
        arc_w_j = jnp.asarray(arc_w)
        arc_pdf_j = jnp.asarray(arc_pdf)

        @jax.jit
        def v1(alpha0, lls):  # alpha0 [B,S], lls [T,B,P]
            def step(alpha, ll_t):
                am = ll_t[:, arc_pdf_j] * ACWT
                score = alpha[:, arc_src_j] + arc_w_j[None, :] + am
                v = score
                for idx in levels:
                    safe = jnp.maximum(idx, 0)
                    g = jnp.where(idx[None] >= 0, v[:, safe], NEG_INF)
                    v = jnp.max(g, axis=2)
                return v, jnp.argmax(v, axis=1).astype(jnp.int32)
            return jax.lax.scan(step, alpha0, lls)

        alpha0 = jnp.zeros((B, S), jnp.float32)
        lls = jnp.asarray(rng.standard_normal((T, B, P)), jnp.float32)
        bench(v1, alpha0, lls, "v1 lane-major flat-gather")

    if "v2" in want:
        # V2: state-emitting, batch-minor alpha [S, B], row gather
        src_j = jnp.asarray(src_sd)          # [S, D]
        w_j = jnp.asarray(w_sd)              # [S, D]
        pdf_j = jnp.asarray(pdf_state)       # [S]

        @jax.jit
        def v2(alpha0, lls):  # alpha0 [S,B], lls [T,P,B]
            def step(alpha, ll_t):
                am = jnp.take(ll_t, pdf_j, axis=0) * ACWT       # [S, B]
                g = jnp.take(alpha, src_j.reshape(-1), axis=0)  # [S*D, B]
                g = g.reshape(S, D, B) + w_j[:, :, None]
                v = jnp.max(g, axis=1) + am
                bp = jnp.argmax(g, axis=1).astype(jnp.int8)
                return v, bp
            return jax.lax.scan(step, alpha0, lls)

        alpha0 = jnp.zeros((S, B), jnp.float32)
        lls = jnp.asarray(rng.standard_normal((T, P, B)), jnp.float32)
        bench(v2, alpha0, lls, "v2 batch-minor row-gather")

    if "v2b" in want:
        # V2b: like V2 but no backpointer output (forward-only cost)
        src_j = jnp.asarray(src_sd)
        w_j = jnp.asarray(w_sd)
        pdf_j = jnp.asarray(pdf_state)

        @jax.jit
        def v2b(alpha0, lls):
            def step(alpha, ll_t):
                am = jnp.take(ll_t, pdf_j, axis=0) * ACWT
                g = jnp.take(alpha, src_j.reshape(-1), axis=0)
                g = g.reshape(S, D, B) + w_j[:, :, None]
                return jnp.max(g, axis=1) + am, None
            return jax.lax.scan(step, alpha0, lls)[0]

        alpha0 = jnp.zeros((S, B), jnp.float32)
        lls = jnp.asarray(rng.standard_normal((T, P, B)), jnp.float32)
        bench(v2b, alpha0, lls, "v2b row-gather no-bp")

    if "v3" in want:
        # V3: gather-free shift form (delta-structured graph), batch-minor
        w_k = jnp.asarray(w_sd.T)           # [D, S] weight for slot k at dst s
        pdf_j = jnp.asarray(pdf_state)
        deltas_t = tuple(int(d) for d in deltas)

        @jax.jit
        def v3(alpha0, lls):
            def step(alpha, ll_t):
                am = jnp.take(ll_t, pdf_j, axis=0) * ACWT
                cands = [jnp.roll(alpha, int(dk), axis=0) + w_k[k][:, None]
                         for k, dk in enumerate(deltas_t)]
                g = jnp.stack(cands, axis=1)  # [S, D, B]
                v = jnp.max(g, axis=1) + am
                bp = jnp.argmax(g, axis=1).astype(jnp.int8)
                return v, bp
            return jax.lax.scan(step, alpha0, lls)

        alpha0 = jnp.zeros((S, B), jnp.float32)
        lls = jnp.asarray(rng.standard_normal((T, P, B)), jnp.float32)
        bench(v3, alpha0, lls, "v3 shift-form")

    if "gmm" in want:
        from voicebridge_tpu.ops import gmm_kernels as K
        from voicebridge_tpu.models.gmm import AmDiagGmm
        num_pdfs, max_mix, dim = P, 5, 39
        am = AmDiagGmm(
            rng.standard_normal((num_pdfs, max_mix, dim)).astype(np.float32),
            np.abs(rng.standard_normal((num_pdfs, max_mix, dim))).astype(np.float32) + 0.5,
            np.full((num_pdfs, max_mix), 1.0 / max_mix, np.float32))
        params = K.pack_gmm(am)
        feats = jnp.asarray(rng.standard_normal((B, 1000, dim)), jnp.float32)
        f = jax.jit(lambda p, x: K.loglikes_batch(p, x))
        jax.block_until_ready(f(params, feats))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f(params, feats))
        dt = (time.perf_counter() - t0) / 3
        print(f"gmm loglikes B=32 T=1000:    {dt*1e3:9.1f} ms  "
              f"-> {B*1000*0.01/dt:9.1f} audio-s/s", flush=True)





def scaling():
    """v2 at varying B and T: audio-s/s scaling."""
    deltas, src_sd, w_sd, pdf_state = make_graph()
    rng = np.random.default_rng(1)
    src_j = jnp.asarray(src_sd)
    w_j = jnp.asarray(w_sd)
    pdf_j = jnp.asarray(pdf_state)

    for b, t in [(64, 100), (128, 100), (64, 1000)]:
        @jax.jit
        def v2(alpha0, lls, _b=b):
            def step(alpha, ll_t):
                am = jnp.take(ll_t, pdf_j, axis=0) * ACWT
                g = jnp.take(alpha, src_j.reshape(-1), axis=0)
                g = g.reshape(S, D, _b) + w_j[:, :, None]
                v = jnp.max(g, axis=1) + am
                bp = jnp.argmax(g, axis=1).astype(jnp.int8)
                return v, bp
            return jax.lax.scan(step, alpha0, lls)

        alpha0 = jnp.zeros((S, b), jnp.float32)
        lls = jnp.asarray(rng.standard_normal((t, P, b)), jnp.float32)
        out = v2(alpha0, lls)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = v2(alpha0, lls)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        print(f"v2 B={b} T={t}: {dt*1e3:9.1f} ms  {dt/t*1e6:8.1f} us/frame"
              f"  -> {b*0.01/(dt/t):9.1f} audio-s/s", flush=True)


if __name__ == "__main__":
    if "scaling" in sys.argv:
        scaling()
        sys.exit(0)
    main()
