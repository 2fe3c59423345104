"""Microbench: Pallas fused kernels vs the XLA paths on the real chip.

Usage: python tools/bench_pallas.py [gmm|all]

(The round-2 Pallas MFCC kernel was removed after measuring 0.92x vs the
XLA rfft path — see COMPONENTS.md backlog #2.)
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


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("gmm", "all"):
        bench_gmm()
