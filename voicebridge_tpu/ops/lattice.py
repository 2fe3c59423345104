"""Device-side lattice generation: windowed Viterbi forward-backward.

Counterpart of the lattice-generating decoder ``LatticeFasterDecoder``
(``decoder/lattice-faster-decoder.cc``) + its pruning
(``PruneActiveTokens``, lattice-beam semantics): an arc instance (frame t,
graph arc a) survives into the lattice iff the best COMPLETE path through it
scores within ``lattice_beam`` of the global best path — exactly the
invariant Kaldi's forward-link pruning converges to.  On TPU this is not
token passing but two arc-parallel max-plus scans:

* forward:  alpha[t][s]  (beam/max-active pruned, identical to the decoder)
* backward: beta[t][s] = max over arcs s--a-->d of  w(a) + acwt*ll[t, pdf(a)]
            + beta[t+1][d],  with beta[nf] = final
* gamma[t][a] = alpha[t][src] + w + acwt*ll + beta[t+1][dst]
  survive iff gamma >= best_total - lattice_beam.

Memory is bounded by the same window strategy as ``viterbi_decode_windowed``:
phase 1 stores one alpha snapshot per window; phase 2 walks windows high→low,
recomputing in-window alphas, carrying beta, and emitting a packed survivor
bitmask per frame.  Only the [W, B, A/8] bitmasks are fetched to the host.

Scores are max-plus (higher = better); the host lattice stores graph and
acoustic costs separately (Kaldi ``LatticeWeight`` convention).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .viterbi import (DenseGraph, NEG_INF, ReductionPlan, _prune, _relax_tree,
                      build_reduction_plan)


def build_src_plan(graph: DenseGraph, k: int = 8) -> tuple:
    """Reduction plan grouping arcs by SOURCE state (for the backward pass)."""
    return build_reduction_plan(graph.arc_src, graph.num_states, k).levels


@functools.partial(jax.jit, static_argnames=("num_states", "max_active", "window"))
def _window_fb(arc_src, arc_dst, levels, rev_levels, arc_pdf, arc_score,
               alpha_snap, beta_carry, ll_win, t0, num_frames, final_score,
               total_best, acoustic_scale, beam, lattice_beam,
               num_states: int, max_active: int, window: int):
    """One reverse-order window of the lattice forward-backward.

    alpha_snap [B, S]: forward scores at frame t0 (window start).
    beta_carry [B, S]: beta at frame t0+window (from the previously processed
    higher window; arbitrary for utterances whose nf <= t0+window — patched
    via the ``t+1 == nf`` select).
    ll_win [B, W, P]; returns (packed survivor mask [W, B, ceil(A/8)] uint8,
    beta at t0 [B, S]).
    """
    b = ll_win.shape[0]

    # in-window alphas, alpha[t] = scores BEFORE consuming frame t
    def fwd(carry, inp):
        alpha, t = carry
        ll_t = inp
        am = ll_t[:, arc_pdf] * acoustic_scale
        score = alpha[:, arc_src] + arc_score[None, :] + am
        na, _ = _relax_tree(score, levels)
        na = _prune(na, beam, max_active)
        active = (t < num_frames)[:, None]
        na = jnp.where(active, na, alpha)
        return (na, t + 1), alpha

    (_, _), alphas = jax.lax.scan(fwd, (alpha_snap, t0),
                                  jnp.swapaxes(ll_win, 0, 1))
    # alphas [W, B, S] = alpha at times t0..t0+W-1

    thresh = (total_best - lattice_beam)[:, None]  # [B, 1]

    def bwd(beta_next, inp):
        alpha_t, ll_t, t = inp
        # effective beta at t+1: final scores where the utterance ends here
        # (final_score is per-utterance [B, S]: zeros when no final state was
        # reachable — Kaldi's partial-path fallback)
        beta_eff = jnp.where((t + 1 == num_frames)[:, None],
                             final_score, beta_next)
        am = ll_t[:, arc_pdf] * acoustic_scale  # [B, A]
        tail = am + arc_score[None, :] + beta_eff[:, arc_dst]  # [B, A]
        gamma = alpha_t[:, arc_src] + tail
        keep = (gamma >= thresh) & (t < num_frames)[:, None]
        beta_t, _ = _relax_tree(tail, rev_levels)
        beta_t = jnp.where((t < num_frames)[:, None], beta_t, beta_next)
        return beta_t, jnp.packbits(keep, axis=-1)

    ts = t0 + jnp.arange(window, dtype=jnp.int32)
    beta_lo, masks = jax.lax.scan(
        bwd, beta_carry,
        (alphas[::-1], jnp.swapaxes(ll_win, 0, 1)[::-1], ts[::-1]))
    return masks[::-1], beta_lo


def lattice_forward_backward(graph: DenseGraph, levels: tuple, rev_levels: tuple,
                             loglikes, num_frames, acoustic_scale: float,
                             beam: float, lattice_beam: float,
                             max_active: int = 0, window: int = 64):
    """Full windowed lattice FB over a shared graph.

    loglikes: [B, T, P] device array.  Returns (survivor mask [T, B, A] bool
    (numpy), total_best [B] numpy, alpha_end [B, S] numpy).
    """
    b, t_total, _p = loglikes.shape
    s = graph.num_states
    nw = max(1, -(-t_total // window))
    t_pad = nw * window
    if t_pad != t_total:
        pad = jnp.zeros((b, t_pad - t_total, loglikes.shape[2]), loglikes.dtype)
        loglikes = jnp.concatenate([loglikes, pad], axis=1)

    arc_src = jnp.asarray(graph.arc_src)
    arc_dst = jnp.asarray(graph.arc_dst)
    arc_pdf = jnp.asarray(graph.arc_pdf)
    arc_score = jnp.asarray(graph.arc_score)
    final_j = jnp.asarray(graph.final_score)
    alpha0 = jnp.broadcast_to(jnp.asarray(graph.alpha0)[None, :], (b, s))
    nf = jnp.asarray(num_frames)
    acwt = jnp.float32(acoustic_scale)
    beam_ = jnp.float32(beam)
    lbeam_ = jnp.float32(lattice_beam)

    @jax.jit
    def window_forward(alpha, at_end, ll_win, t0):
        def frame(c, ll_t):
            al, ae, tt = c
            am = ll_t[:, arc_pdf] * acwt
            score = al[:, arc_src] + arc_score[None, :] + am
            na, _ = _relax_tree(score, levels)
            na = _prune(na, beam_, max_active)
            active = (tt < nf)[:, None]
            al = jnp.where(active, na, al)
            end = (tt + 1 == nf)[:, None]
            ae = jnp.where(end, al, ae)
            return (al, ae, tt + 1), None

        (al, ae, _), _ = jax.lax.scan(frame, (alpha, at_end, t0),
                                      jnp.swapaxes(ll_win, 0, 1))
        return al, ae

    # phase 1: snapshots
    alpha = alpha0
    at_end = jnp.where((nf == 0)[:, None], alpha0, jnp.full((b, s), NEG_INF))
    snaps = []
    for w in range(nw):
        snaps.append(alpha)
        ll_win = jax.lax.dynamic_slice_in_dim(loglikes, w * window, window, 1)
        alpha, at_end = window_forward(alpha, at_end, ll_win,
                                       jnp.int32(w * window))

    # best complete score per utterance (prefer final-reachable)
    with_final = jnp.max(at_end + final_j[None, :], axis=1)
    no_final = jnp.max(at_end, axis=1)
    use_final = with_final > NEG_INF / 2
    total_best = jnp.where(use_final, with_final, no_final)
    # when no final state is reachable, accept best partial path (Kaldi's
    # partial-path fallback): every reachable end state final with cost 0
    final_eff = jnp.where(use_final[:, None], final_j[None, :],
                          jnp.zeros((b, s)))

    # phase 2: reverse windows
    mask_chunks = []
    beta = jnp.full((b, s), NEG_INF)
    for w in range(nw - 1, -1, -1):
        lo = w * window
        ll_win = jax.lax.dynamic_slice_in_dim(loglikes, lo, window, 1)
        masks, beta = _window_fb(
            arc_src, arc_dst, levels, rev_levels, arc_pdf, arc_score,
            snaps[w], beta, ll_win, jnp.int32(lo), nf, final_eff,
            total_best, acwt, beam_, lbeam_, s, max_active, window)
        mask_chunks.append(masks)

    packed = np.asarray(jnp.concatenate(mask_chunks[::-1], axis=0))
    a = graph.num_arcs
    mask = np.unpackbits(packed, axis=-1, count=a).astype(bool)[:t_total]
    return mask, np.asarray(total_best), np.asarray(at_end), np.asarray(use_final)
