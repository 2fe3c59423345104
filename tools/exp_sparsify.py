"""Micro-bench: candidate sparsify kernels for the lattice survivor fetch.

Compares on the real chip, at M = window*nbytes = 834k, B = 32:
  (a) the round-3 binary-search compaction (_sparsify_bytes)
  (b) lane-major top_k over encoded keys (no element gathers)
for budgets K in {4096, 32768}.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from voicebridge_tpu.ops.lattice import _sparsify_bytes  # noqa: E402


def _sync(r):
    for x in jax.tree.leaves(r):
        if hasattr(x, "dtype"):
            np.asarray(x.ravel()[:1].astype(jnp.float32))


def timeit(fn, iters=3):
    fn()
    _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        _sync(fn())
    return (time.perf_counter() - t0) / iters


def topk_sparsify(flat, budget):
    m, b = flat.shape
    nz = flat != 0
    key = jnp.where(
        nz, ((m - jnp.arange(m, dtype=jnp.int32))[:, None] << 8)
        | flat.astype(jnp.int32), 0)
    topv, _ = jax.lax.top_k(key.T, budget)  # [B, K] desc = ascending pos
    val = (topv & 0xFF).astype(jnp.uint8).T
    idx = jnp.where(topv > 0, m - (topv >> 8), -1).T
    count = jnp.sum(nz.astype(jnp.int32), axis=0)
    return idx, val, count


def main():
    m, b = 16 * 52139, 32
    rng = np.random.default_rng(0)
    flat_np = np.zeros((m, b), np.uint8)
    # ~23k nonzero bytes per lane (the measured worst window)
    for i in range(b):
        pos = rng.choice(m, size=23000, replace=False)
        flat_np[pos, i] = rng.integers(1, 256, size=23000)
    flat = jnp.asarray(flat_np)
    jax.block_until_ready(flat)

    for k in (4096, 32768):
        f_bin = jax.jit(lambda x, k=k: _sparsify_bytes(x, k))
        t_bin = timeit(lambda: f_bin(flat))
        f_top = jax.jit(lambda x, k=k: topk_sparsify(x, k))
        t_top = timeit(lambda: f_top(flat))
        print(f"K={k}: binary-search {t_bin*1e3:7.1f} ms   "
              f"top_k {t_top*1e3:7.1f} ms", flush=True)

    # parity check at K=32768 (covers all 23k nonzeros)
    ib, vb, cb = jax.tree.map(np.asarray, f_bin(flat))
    it_, vt, ct = jax.tree.map(np.asarray, f_top(flat))
    assert (cb == ct).all()
    for i in range(b):
        c = int(cb[i])
        np.testing.assert_array_equal(ib[:c, i], it_[:c, i])
        np.testing.assert_array_equal(vb[:c, i], vt[:c, i])
    print("parity ok")


if __name__ == "__main__":
    main()


def word_sort_sparsify(flat, budget):
    """Word-level variant: pack 4 consecutive bytes into one int32 value,
    sort (key=position-if-nonzero, val=word) over M/4 columns, slice the
    top budget//2 words (a nonzero word holds >=1 nonzero byte)."""
    m, b = flat.shape
    mw = m // 4
    w8 = flat.reshape(mw, 4, b).astype(jnp.int32)
    words = (w8[:, 0] << 24) | (w8[:, 1] << 16) | (w8[:, 2] << 8) | w8[:, 3]
    nz = words != 0
    key = jnp.where(nz, mw - jnp.arange(mw, dtype=jnp.int32)[:, None], 0)
    kk = min(budget // 2, mw)
    sk, sv = jax.lax.sort([key.T, words.T], dimension=-1, num_keys=1)
    topk, topw = sk[:, -kk:][:, ::-1], sv[:, -kk:][:, ::-1]
    idx = jnp.where(topk > 0, mw - topk, -1).T
    count = jnp.sum(nz.astype(jnp.int32), axis=0)
    return idx, topw.T, count


def bench_word(flat, k):
    f = jax.jit(lambda x, k=k: word_sort_sparsify(x, k))
    t = timeit(lambda: f(flat))
    print(f"K={k}: word-sort {t*1e3:7.1f} ms", flush=True)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "word":
    m, b = 16 * 52139 // 4 * 4, 32
    rng = np.random.default_rng(0)
    flat_np = np.zeros((m, b), np.uint8)
    for i in range(b):
        pos = rng.choice(m, size=23000, replace=False)
        flat_np[pos, i] = rng.integers(1, 256, size=23000)
    flat = jnp.asarray(flat_np)
    jax.block_until_ready(flat)
    for k in (4096, 32768):
        bench_word(flat, k)
    sys.exit(0)
