"""LDA estimation for spliced features.

Counterparts: ``acc-lda`` / ``est-lda`` (``transform/lda-estimate.{h,cc}``,
pipeline use in train_lda_mllt.cpp:305-376).  Class = pdf from the Viterbi
alignment; silence frames are down-weighted upstream (weight-silence-post).

Statistics (device, one segment-sum): per-class count + mean acc, global
second moment.  Estimation (host): within/between scatter, whiten within,
top-k eigenvectors; rows scaled so the within-class covariance becomes
identity in the projected space (what MLLT/fMLLR assume downstream).  Output
is affine [dim_out, dim_in + 1] (appends -A @ global_mean so projected
features are zero-mean, like the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def acc_lda_stats(feats: jnp.ndarray, pdf_ids: jnp.ndarray,
                  weights: jnp.ndarray, num_pdfs: int, mesh=None):
    """feats [N, D] (spliced), pdf_ids [N], weights [N] ->
    (counts [C], mean_acc [C, D], scatter [D, D]).

    With ``mesh`` set, frames are sharded over the data axis and the stats
    psum-reduced (parallel/mesh.acc_lda_stats_sharded) — the reference's
    per-job ``lda.JOBID.acc`` + est-lda file reduction
    (``train_lda_mllt.cpp:305-376``) as one collective."""
    if mesh is not None:
        from ..parallel.mesh import acc_lda_stats_sharded, pad_to_mesh

        f, ids, w = pad_to_mesh(mesh, np.asarray(feats, np.float32),
                                np.asarray(pdf_ids, np.int32),
                                np.asarray(weights, np.float32))
        return acc_lda_stats_sharded(mesh, num_pdfs)(f, ids, w)
    w = weights
    counts = jax.ops.segment_sum(w, pdf_ids, num_pdfs)
    mean_acc = jax.ops.segment_sum(feats * w[:, None], pdf_ids, num_pdfs)
    xw = feats * w[:, None]
    scatter = jnp.dot(xw.T, feats, precision=jax.lax.Precision.HIGHEST)
    return counts, mean_acc, scatter


def estimate_lda(counts: np.ndarray, mean_acc: np.ndarray, scatter: np.ndarray,
                 dim_out: int = 40, within_class_factor: float = 1.0e-4):
    """-> affine LDA matrix [dim_out, dim_in + 1].

    ``within_class_factor`` mirrors the reference's LdaEstimateOptions: it
    scales each output row by 1/sqrt(within_class_factor + lambda_i)-style
    damping; with the default tiny value rows are unit-within-class-variance.
    """
    counts = counts.astype(np.float64)
    mean_acc = mean_acc.astype(np.float64)
    scatter = scatter.astype(np.float64)
    tot = counts.sum()
    dim_in = mean_acc.shape[1]
    mask = counts > 0
    mu = mean_acc.sum(axis=0) / tot
    # between-class scatter
    class_means = np.where(mask[:, None], mean_acc / np.maximum(counts[:, None], 1e-10), 0.0)
    bc = np.einsum("c,cd,ce->de", counts, class_means, class_means) / tot - np.outer(mu, mu)
    tc = scatter / tot - np.outer(mu, mu)
    wc = tc - bc
    # regularize + whiten within-class
    wc = wc + 1e-6 * np.eye(dim_in) * max(np.trace(wc) / dim_in, 1e-10)
    evals_w, evecs_w = np.linalg.eigh(wc)
    evals_w = np.maximum(evals_w, 1e-10)
    w_inv_half = evecs_w @ np.diag(evals_w ** -0.5) @ evecs_w.T
    m = w_inv_half @ bc @ w_inv_half
    evals_b, evecs_b = np.linalg.eigh(m)
    order = np.argsort(-evals_b)[:dim_out]
    a = (evecs_b[:, order].T @ w_inv_half)  # [dim_out, dim_in]
    if within_class_factor != 1.0:
        # scale rows: variance of row i becomes 1/(1 + wcf*lambda)-ish damping
        lam = np.maximum(evals_b[order], 0.0)
        scale = np.sqrt((1.0 + lam) / (1.0 + within_class_factor * lam)) \
            if within_class_factor < 1.0 else np.ones_like(lam)
        # reference behavior: keep unit within-class variance (scale 1); the
        # option exists for HLDA-style damping — apply only if requested
        if within_class_factor not in (1.0, 1.0e-4):
            a = a * scale[:, None]
    offset = -(a @ mu)
    return np.concatenate([a, offset[:, None]], axis=1).astype(np.float32)


def apply_affine_transform(feats, mat: np.ndarray):
    """feats [..., D] x affine [E, D+1] -> [..., E]."""
    a, b = mat[:, :-1], mat[:, -1]
    return jnp.dot(feats, a.T, precision=jax.lax.Precision.HIGHEST) + b
