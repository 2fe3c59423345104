"""Decode jit-cache stability: repeated decodes with different raw lengths
must NOT recompile (VERDICT r1 weak #2/#8 — per-batch window/shape
recompiles).  Probes the jitted functions' cache sizes directly.
"""

import numpy as np
import jax.numpy as jnp

from voicebridge_tpu.ops import decode_core as DC
from voicebridge_tpu.steps.decode import Decoder
from tests.test_decode_core import random_dense_graph


def test_decode_best_path_no_recompile_across_lengths():
    rng = np.random.default_rng(0)
    g = random_dense_graph(rng, s=30, a=150)
    plan = DC.build_emit_plan(g, d=4, k_upper=3)
    dev = DC.plan_to_device(plan)
    b, p, chunk = 2, 7, 8

    def run(t):
        ll = jnp.asarray(rng.standard_normal((b, t, p)), jnp.float32)
        nf = np.array([t, max(1, t - 3)], np.int32)
        return DC.decode_best_path(g, plan, dev, ll, nf, 0.7, chunk=chunk)

    run(23)  # warm (pads to 24 = 3 chunks of 8)
    scan0 = DC.viterbi_scan._cache_size()
    bt0 = DC.backtrace_scan._cache_size()
    run(17)  # pads to 24 as well: same compiled programs
    run(20)
    assert DC.viterbi_scan._cache_size() == scan0, \
        "varying T recompiled the forward scan"
    assert DC.backtrace_scan._cache_size() == bt0, \
        "varying T recompiled the backtrace"


def test_bucket_shapes():
    f = np.zeros((5, 130, 13), np.float32)
    nf = np.array([130, 100, 90, 10, 1])
    padded, nf2, b = Decoder._bucket(f, nf)
    assert padded.shape == (8, 256, 13)
    assert b == 5 and list(nf2[:5]) == list(nf) and all(nf2[5:] == 0)
    # already-bucketed input passes through untouched
    f2 = np.zeros((8, 256, 13), np.float32)
    p2, _, _ = Decoder._bucket(f2, np.full(8, 256))
    assert p2 is f2
