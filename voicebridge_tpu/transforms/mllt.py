"""MLLT / global STC estimation.

Counterparts: ``gmm-acc-mllt`` / ``est-mllt`` / ``gmm-transform-means`` /
``compose-transforms`` (``transform/mllt.{h,cc}``; pipeline
train_lda_mllt.cpp:694-...).

Accumulators (device): for every frame aligned to pdf p with mixture
posteriors gamma_m:

    G[d] += sum_m gamma_m * inv_var[p,m,d] * (x - mu[p,m]) (x - mu[p,m])^T
    beta += sum gamma

Update (host): Kaldi's iterative row solve — for each row d of M:
    c_d = cofactor row of M (row of det(M) * M^{-T})
    m_d = sqrt(beta / (c_d^T G_d^{-1} c_d)) * G_d^{-1} c_d
maximizing  beta*log|det M| - 0.5 sum_d m_d^T G_d m_d.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.gmm_kernels import GmmParams, aligned_mixture_logliks


@jax.jit
def _mllt_chunk(params: GmmParams, means, inv_vars, feats, pdf_ids, weights):
    """One chunk's (G [D, D, D], beta): aligned-pdf gather + (n, m)-flattened
    pairwise contractions ([K, D, D] intermediate, K = chunk * max_mix —
    bounded, unlike the all-pdf [N, P, M] evaluation)."""
    sel = aligned_mixture_logliks(params, feats, pdf_ids)  # [N, M]
    gamma = jax.nn.softmax(sel, axis=1) * weights[:, None]  # [N, M]
    mu = means[pdf_ids]  # [N, M, D]
    iv = inv_vars[pdf_ids]  # [N, M, D]
    n, m, d = mu.shape
    diff = (feats[:, None, :] - mu).reshape(n * m, d)  # [K, D]
    w = (gamma[:, :, None] * iv).reshape(n * m, d)  # [K, D]
    # G[d, i, j] = sum_k w[k, d] diff[k, i] diff[k, j]
    y = w[:, :, None] * diff[:, None, :]  # [K, D, D]
    g = jnp.einsum("kdi,kj->dij", y, diff,
                   precision=jax.lax.Precision.HIGHEST)
    return g, jnp.sum(gamma)


def acc_mllt_stats(params: GmmParams, means: jnp.ndarray, inv_vars: jnp.ndarray,
                   feats: jnp.ndarray, pdf_ids: jnp.ndarray,
                   weights: jnp.ndarray, chunk: int = 1 << 13, mesh=None):
    """feats [N, D]; means/inv_vars [P, M, D] -> (G [D, D, D], beta).

    Chunked host wrapper (fixed-size zero-weight-padded chunks) over the
    jitted contraction — the reference's per-frame loop
    (MlltAccs::AccumulateFromPosteriors) at corpus scale.

    With ``mesh`` set, each chunk's frames are sharded over the data axis
    and its (G, beta) psum-reduced (parallel/mesh.acc_mllt_stats_sharded) —
    the reference's per-job ``m.JOBID.macc`` + est-mllt file reduction
    (``train_lda_mllt.cpp:694-``) as one collective per chunk."""
    feats = np.asarray(feats, np.float32)
    pdf_ids = np.asarray(pdf_ids, np.int32)
    weights = np.asarray(weights, np.float32)
    n, d = feats.shape
    c = min(chunk, 1 << max(11, (max(n, 2) - 1).bit_length()))
    acc_fn = _mllt_chunk
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS, acc_mllt_stats_sharded

        nd = mesh.shape[DATA_AXIS]
        c = -(-c // nd) * nd  # chunk divisible by the data axis
        sharded = acc_mllt_stats_sharded(mesh)

        def acc_fn(params, means, inv_vars, xs, ps, ws):  # noqa: F811
            return sharded(params, means, inv_vars, xs, ps, ws)
    g = np.zeros((d, d, d), np.float64)
    beta = 0.0
    for lo in range(0, n, c):
        hi = min(n, lo + c)
        if hi - lo < c:
            xs = np.zeros((c, d), np.float32)
            xs[: hi - lo] = feats[lo:hi]
            ps = np.zeros(c, np.int32)
            ps[: hi - lo] = pdf_ids[lo:hi]
            ws = np.zeros(c, np.float32)
            ws[: hi - lo] = weights[lo:hi]
        else:
            xs, ps, ws = feats[lo:hi], pdf_ids[lo:hi], weights[lo:hi]
        g_c, b_c = acc_fn(params, means, inv_vars, jnp.asarray(xs),
                          jnp.asarray(ps), jnp.asarray(ws))
        g += np.asarray(g_c, np.float64)
        beta += float(b_c)
    return jnp.asarray(g.astype(np.float32)), beta


def est_mllt(g: np.ndarray, beta: float, num_iters: int = 200,
             tol: float = 1e-7) -> tuple[np.ndarray, float]:
    """-> (M [D, D], objf improvement per frame).  est-mllt's row iteration."""
    g = g.astype(np.float64)
    d = g.shape[0]
    m = np.eye(d)
    ginv = np.stack([np.linalg.inv(g[i] + 1e-6 * np.eye(d) * max(np.trace(g[i]) / d, 1e-10))
                     for i in range(d)])

    def objf(mm):
        sign, logdet = np.linalg.slogdet(mm)
        if sign <= 0:
            return -np.inf
        quad = 0.5 * sum(mm[i] @ g[i] @ mm[i] for i in range(d))
        return beta * logdet - quad

    prev = objf(m)
    start = prev
    for _ in range(num_iters):
        for i in range(d):
            inv_t = np.linalg.inv(m).T
            cof = np.linalg.det(m) * inv_t[i]  # cofactor row
            gc = ginv[i] @ cof
            denom = cof @ gc
            if denom <= 0:
                continue
            scale = np.sqrt(beta / denom)
            # choose sign maximizing objf (log|det| term)
            m[i] = scale * gc
        cur = objf(m)
        if cur - prev < tol * max(abs(prev), 1.0):
            prev = cur
            break
        prev = cur
    impr = (prev - start) / max(beta, 1.0)
    return m.astype(np.float32), float(impr)


def compose_transforms(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """compose-transforms: result(x) = a(b(x)), handling affine shapes
    ([E, D] or [E, D+1])."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if a.shape[1] == b.shape[0]:  # linear . (linear|affine)
        return (a @ b).astype(np.float32)
    if a.shape[1] == b.shape[0] + 1:  # affine a over linear/affine b
        lin = a[:, :-1] @ b
        if b.shape[1] == b.shape[0]:  # b linear: append a's offset
            return np.concatenate([lin, a[:, -1:]], axis=1).astype(np.float32)
        # b affine: fold offsets
        out = lin.copy()
        out[:, -1] += a[:, -1]
        return out.astype(np.float32)
    raise ValueError(f"incompatible transform shapes {a.shape} {b.shape}")


def transform_model_means(am, m: np.ndarray) -> None:
    """gmm-transform-means: mu <- M mu (in place), gconsts recomputed."""
    means = am.means()  # [P, M, D]
    new_means = np.einsum("de,pme->pmd", m.astype(np.float64), means)
    am.means_invvars = (new_means * am.inv_vars).astype(np.float32)
    am.compute_gconsts()
