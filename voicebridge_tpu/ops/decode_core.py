"""TPU-native Viterbi decode core: batch-minor state scores + in-degree rows.

Replaces the token-passing hot loop of the reference decoder
(``LatticeFasterDecoder::Decode``/``ProcessEmitting``,
``kaldi-master/src/decoder/lattice-faster-decoder.cc:72-89``) with a dense
arc-parallel relaxation designed around what is actually fast on TPU
(measured, tools/exp_decode_variants.py):

* **Batch-minor layout** ``alpha[S, B]``: every gather of a source state's
  scores is a *row* gather (``B`` contiguous floats), which XLA:TPU lowers to
  vector loads — element gathers in the lane dimension (round 1's
  ``alpha[:, arc_src]`` with [B, A] results) run ~130x slower
  (1.41 -> ~190+ audio-s/s at B=32 on one v5e chip).
* **In-degree rows**: incoming arcs of each state are grouped by
  ``(dst, pdf)`` into rows of width ``D`` (adapted to the run-length
  distribution).  A row is pdf-pure, so the acoustic score is ONE gathered
  value per row instead of one per arc.  Real HCLG graphs built with
  reorder-style self-loops (``fst/hmm_graph.py add_self_loops``) have the
  "all arcs entering a state share one pdf" property, so rows pack densely.
* **One fused scan** over all frames per dispatch (no per-window Python
  dispatch).  Backpointers are ONE integer per state per frame: the winner
  code ``rowloc * D + slot`` (uint8 when ``max_rows_per_state * D <= 256``,
  int16/int32 otherwise).  Winners propagate through the reduction tree by
  equality-masked max — NOT take_along_axis, whose lane-wise element gather
  is ~50x slower than the whole relaxation on TPU.
* Backtrace runs on device as a tiny [T] scan; one host fetch at the end.

Scores are max-plus (higher is better), like ``ops/viterbi.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .viterbi import NEG_INF, DenseGraph

__all__ = [
    "EmitPlan", "build_emit_plan", "plan_to_device", "viterbi_scan",
    "decode_best_path",
]


class EmitPlan(NamedTuple):
    """Host-built decode plan for a shared graph (see module docstring).

    ``S`` counts real states; the plan appends one dead pad state (index
    ``S``) whose score is pinned to NEG_INF so padded ``row_src`` entries are
    harmless.  Rows are sorted by destination state, so the rows of state
    ``s`` are ``row_start[s] : row_start[s+1]``.

    The row -> state max-reduction is a THREE-stage tree shaped for real
    HCLGs, whose in-degree distribution is extremely skewed (one LM-backoff
    hub state can own thousands of (dst, pdf) rows while the median state
    owns one):

    * ``lvl1`` [L1, K]: chunk every state's rows K at a time (contiguous in
      row space);
    * ``hub_idx`` [n_hub, H_pad]: for the few states with more than K
      level-1 chunks, ONE wide dense reduction over their (contiguous)
      chunk range — replacing what used to be log_K(H) additional
      full-[S]-width levels (a 90k-state graph with a 5331-row hub needed
      SEVEN ~90k-wide levels; measured 6x the relaxation's gather traffic);
    * ``final_idx`` [S+1, K] into level-1 chunks (states with <= K chunks)
      merged with ``final_hub`` [S+1] into the hub outputs (-1 elsewhere).
    """

    row_src: np.ndarray  # [R, D] int32 source state per slot (pad: S)
    row_w: np.ndarray  # [R, D] f32 graph score (pad: NEG_INF)
    row_pdf: np.ndarray  # [R] int32 pdf shared by the row's arcs
    row_arc: np.ndarray  # [R, D] int32 original arc id (pad: -1; host only)
    row_start: np.ndarray  # [S+2] int32 CSR of rows per state
    lvl1: np.ndarray  # [L1, K] int32 row indices (-1 pad)
    hub_idx: np.ndarray  # [n_hub, H_pad] int32 level-1 chunk indices
    #                      (-1 pad); n_hub == 0 when no state overflows
    final_idx: np.ndarray  # [S+1, K] int32 level-1 chunk indices (-1 pad;
    #                        all -1 for hub states)
    final_hub: np.ndarray  # [S+1] int32 hub output slot (-1 for non-hub)
    num_states: int  # S (real states, excluding the pad state)
    packed: bool  # True: bp code fits uint8 (else int16/int32)

    @property
    def num_rows(self) -> int:
        return len(self.row_pdf)

    @property
    def d(self) -> int:
        return self.row_w.shape[1]


def _chunk_runs(run_starts, run_ends, elems, width):
    """Chunk [start, end) runs over ``elems`` into [n_chunk, width] index rows
    (-1 padded).  Returns (rows, chunk_run)."""
    n = len(elems)
    run_lens = run_ends - run_starts
    cpr = -(-run_lens // width)
    n_chunk = int(cpr.sum())
    if n_chunk == 0:
        return (np.zeros((0, width), np.int64),
                np.zeros(0, np.int64))
    first = np.concatenate([[0], np.cumsum(cpr[:-1])])
    chunk_run = np.repeat(np.arange(len(run_starts)), cpr)
    rank = np.arange(n_chunk) - first[chunk_run]
    start = run_starts[chunk_run] + width * rank
    pos = start[:, None] + np.arange(width)[None, :]
    valid = pos < run_ends[chunk_run][:, None]
    rows = np.where(valid, elems[np.minimum(pos, max(n - 1, 0))], -1)
    return rows, chunk_run


def _runs(key: np.ndarray):
    n = len(key)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    b = np.flatnonzero(np.diff(key)) + 1
    return (np.concatenate([[0], b]).astype(np.int64),
            np.concatenate([b, [n]]).astype(np.int64))


def build_emit_plan(graph: DenseGraph, d: Optional[int] = None,
                    k_upper: int = 4) -> EmitPlan:
    """Group ``graph``'s arcs by (dst, pdf) into rows and build the
    row->state max-reduction levels.  ``d`` (row width) defaults to a value
    adapted to the (dst, pdf) run-length distribution."""
    s_real = graph.num_states
    s_pad = s_real + 1
    a = graph.num_arcs
    dst = graph.arc_dst.astype(np.int64)
    pdf = graph.arc_pdf.astype(np.int64)
    num_pdfs = int(pdf.max()) + 1 if a else 1

    order = np.argsort(dst * num_pdfs + pdf, kind="stable")
    dst_s, pdf_s = dst[order], pdf[order]
    run_starts, run_ends = _runs(dst_s * num_pdfs + pdf_s)

    if d is None:
        lens = run_ends - run_starts
        if len(lens) == 0:
            d = 2
        else:
            p90 = float(np.quantile(lens, 0.9))
            d = int(min(8, max(2, 2 ** int(np.ceil(np.log2(max(p90, 2)))))))

    arc_rows, chunk_run = _chunk_runs(run_starts, run_ends, order, d)
    chunk_dst = dst_s[run_starts][chunk_run] if len(chunk_run) else \
        np.zeros(0, np.int64)
    chunk_pdf = pdf_s[run_starts][chunk_run] if len(chunk_run) else \
        np.zeros(0, np.int64)

    # every state (incl. the pad state) needs at least one row; add dead rows
    # for row-less states so the reduction covers all of them
    have = np.zeros(s_pad, bool)
    have[chunk_dst] = True
    missing = np.flatnonzero(~have)
    row_dst = np.concatenate([chunk_dst, missing]).astype(np.int64)
    row_pdf_all = np.concatenate([chunk_pdf, np.zeros(len(missing), np.int64)])
    row_arc = np.concatenate(
        [arc_rows, np.full((len(missing), d), -1, np.int64)], axis=0)

    # sort rows by destination so each state's rows are contiguous
    row_order = np.argsort(row_dst, kind="stable")
    row_dst = row_dst[row_order]
    row_pdf_all = row_pdf_all[row_order].astype(np.int32)
    row_arc = row_arc[row_order].astype(np.int32)
    r = len(row_dst)

    rvalid = row_arc >= 0
    safe = np.maximum(row_arc, 0)
    row_src = np.where(rvalid, graph.arc_src[safe], s_real).astype(np.int32)
    row_w = np.where(rvalid, graph.arc_score[safe], NEG_INF).astype(np.float32)

    row_start = np.zeros(s_pad + 1, np.int64)
    np.add.at(row_start, row_dst + 1, 1)
    row_start = np.cumsum(row_start).astype(np.int32)
    max_rows = int(np.diff(row_start).max())
    # bp code = rowloc * d + slot, stored as uint8 when it fits, else int16
    assert max_rows * d < 2 ** 15, \
        f"state with {max_rows} rows exceeds the int16 bp code range"
    packed = max_rows * d <= 256

    # ---- three-stage reduction tree (see EmitPlan docstring) -------------
    # level 1: chunk each state's (contiguous) rows k_upper at a time
    rows_per_state = np.diff(row_start).astype(np.int64)
    lvl1, chunk_state = _chunk_runs(
        row_start[:-1].astype(np.int64), row_start[1:].astype(np.int64),
        np.arange(r, dtype=np.int64), k_upper)
    chunks_per_state = -(-rows_per_state // k_upper)
    first_chunk = np.concatenate([[0], np.cumsum(chunks_per_state[:-1])])
    # states whose chunk count exceeds k_upper need the hub stage
    hub_states = np.flatnonzero(chunks_per_state > k_upper)
    n_hub = len(hub_states)
    final_hub = np.full(s_pad, -1, np.int64)
    if n_hub:
        h_pad = int(chunks_per_state[hub_states].max())
        hub_idx = np.full((n_hub, h_pad), -1, np.int64)
        for i, hs in enumerate(hub_states):
            c0, cn = int(first_chunk[hs]), int(chunks_per_state[hs])
            hub_idx[i, :cn] = np.arange(c0, c0 + cn)
        final_hub[hub_states] = np.arange(n_hub)
    else:
        hub_idx = np.zeros((0, 1), np.int64)
    final_idx = np.full((s_pad, k_upper), -1, np.int64)
    normal = chunks_per_state <= k_upper
    for k in range(k_upper):
        sel = normal & (chunks_per_state > k)
        final_idx[sel, k] = first_chunk[sel] + k

    assert int(row_start[-1]) == r
    return EmitPlan(row_src=row_src, row_w=row_w, row_pdf=row_pdf_all,
                    row_arc=row_arc, row_start=row_start,
                    lvl1=lvl1.astype(np.int32),
                    hub_idx=hub_idx.astype(np.int32),
                    final_idx=final_idx.astype(np.int32),
                    final_hub=final_hub.astype(np.int32),
                    num_states=s_real, packed=packed)


class EmitPlanDev(NamedTuple):
    """Device half of an EmitPlan (pure array pytree for jit)."""

    row_src: jnp.ndarray  # [R*D] flattened
    row_w: jnp.ndarray  # [R, D]
    row_pdf: jnp.ndarray  # [R]
    row_start: jnp.ndarray  # [S+2]
    lvl1: jnp.ndarray  # [L1, K]
    hub_idx: jnp.ndarray  # [n_hub, H_pad] ([0, 1] when no hubs)
    final_idx: jnp.ndarray  # [S+1, K]
    final_hub: jnp.ndarray  # [S+1]


def plan_to_device(plan: EmitPlan) -> EmitPlanDev:
    return EmitPlanDev(
        row_src=jnp.asarray(plan.row_src.reshape(-1)),
        row_w=jnp.asarray(plan.row_w),
        row_pdf=jnp.asarray(plan.row_pdf),
        row_start=jnp.asarray(plan.row_start),
        lvl1=jnp.asarray(plan.lvl1),
        hub_idx=jnp.asarray(plan.hub_idx),
        final_idx=jnp.asarray(plan.final_idx),
        final_hub=jnp.asarray(plan.final_hub),
    )


def _bp_dtype(plan_packed: bool):
    return jnp.uint8 if plan_packed else jnp.int16


def _gather_max(v, idx, b):
    """max over idx's K slots of v's rows: idx [L, K] (-1 pad) -> [L, B]."""
    l, k = idx.shape
    safe = jnp.maximum(idx, 0).reshape(-1)
    valid = (idx >= 0)[:, :, None]
    cand = jnp.where(valid, jnp.take(v, safe, axis=0).reshape(l, k, b),
                     NEG_INF)
    return jnp.max(cand, axis=1)


def value_tree(v, dev: EmitPlanDev, b):
    """Row values [R, B] -> state values [S+1, B] via the three-stage tree
    (lvl1 chunks -> optional hub wide-reduce -> final merge); values only,
    no winner codes."""
    v1 = _gather_max(v, dev.lvl1, b)
    out = _gather_max(v1, dev.final_idx, b)
    if dev.hub_idx.shape[0]:
        vh = _gather_max(v1, dev.hub_idx, b)
        safe_h = jnp.maximum(dev.final_hub, 0)
        vh2 = jnp.where((dev.final_hub >= 0)[:, None],
                        jnp.take(vh, safe_h, axis=0), NEG_INF)
        out = jnp.maximum(out, vh2)
    return out


def emit_value_step(alpha, ll_t, dev: EmitPlanDev, acwt):
    """Value-only frame relaxation (no backpointer codes): alpha [S+1, B],
    ll_t [P, B] -> new alpha [S+1, B].  Used by the lattice forward-backward
    where winners are not needed (masks come from the gamma threshold)."""
    r, d_w = dev.row_w.shape
    b = alpha.shape[1]
    am = jnp.take(ll_t, dev.row_pdf, axis=0) * acwt  # [R, B]
    g = jnp.take(alpha, dev.row_src, axis=0).reshape(r, d_w, b) \
        + dev.row_w[:, :, None]
    v = jnp.max(g, axis=1) + am  # [R, B]
    return value_tree(v, dev, b)


def _emit_step(alpha, ll_t, dev: EmitPlanDev, acwt, packed: bool, beam=None):
    """One frame of relaxation.  alpha [S+1, B], ll_t [P, B].

    Returns (new_alpha [S+1, B], bp [S+1, B]) where bp is the winner code
    ``rowloc * D + slot`` relative to the state's first row.
    """
    r, d_w = dev.row_w.shape
    b = alpha.shape[1]
    am = jnp.take(ll_t, dev.row_pdf, axis=0) * acwt  # [R, B]
    g = jnp.take(alpha, dev.row_src, axis=0).reshape(r, d_w, b) \
        + dev.row_w[:, :, None]
    slot = jnp.argmax(g, axis=1)  # [R, B] int32 (axis reduction: VPU-cheap)
    v = jnp.max(g, axis=1) + am  # [R, B]
    # winner code = global_row * D + slot; propagated through the tree by
    # equality-masked max (take_along_axis would be an element gather)
    code = jnp.arange(r, dtype=jnp.int32)[:, None] * d_w + slot  # [R, B]

    def level(v_in, code_in, idx):
        l, k = idx.shape
        safe = jnp.maximum(idx, 0).reshape(-1)
        valid = (idx >= 0)[:, :, None]
        cand = jnp.where(valid,
                         jnp.take(v_in, safe, axis=0).reshape(l, k, b),
                         NEG_INF)
        ccode = jnp.where(valid,
                          jnp.take(code_in, safe, axis=0).reshape(l, k, b),
                          -1)
        v_out = jnp.max(cand, axis=1)  # [L, B]
        # exact-equality tie-break: any maximal candidate's code is a valid
        # backpointer; take the largest so (value, code) stay consistent
        c_out = jnp.max(jnp.where(cand == v_out[:, None, :], ccode, -1),
                        axis=1)
        return v_out, c_out

    v1, code1 = level(v, code, dev.lvl1)
    v, code = level(v1, code1, dev.final_idx)
    if dev.hub_idx.shape[0]:
        vh, ch = level(v1, code1, dev.hub_idx)
        safe_h = jnp.maximum(dev.final_hub, 0)
        hub_ok = (dev.final_hub >= 0)[:, None]
        vh2 = jnp.where(hub_ok, jnp.take(vh, safe_h, axis=0), NEG_INF)
        ch2 = jnp.where(hub_ok, jnp.take(ch, safe_h, axis=0), -1)
        take_h = vh2 > v
        v = jnp.maximum(v, vh2)
        code = jnp.where(take_h, ch2, code)
    # v, code now have S+1 rows (state-indexed)
    if beam is not None:
        best = jnp.max(v, axis=0, keepdims=True)
        v = jnp.where(v >= best - beam, v, NEG_INF)
    bp = code - dev.row_start[:-1, None] * d_w
    return v, bp.astype(_bp_dtype(packed))


@functools.partial(jax.jit, static_argnames=("packed", "use_beam", "with_bp"))
def viterbi_scan(dev: EmitPlanDev, alpha, alpha_at_end, loglikes, num_frames,
                 t0, acoustic_scale, beam, packed: bool,
                 use_beam: bool = False, with_bp: bool = True):
    """Forward Viterbi over a block of frames in ONE compiled scan, resuming
    from (alpha, alpha_at_end) at absolute frame ``t0``.

    loglikes [B, T, P]; num_frames [B].  Returns
    ((alpha [S+1, B], alpha_at_end [S+1, B]), bp) with bp stacked over T.
    ``with_bp=False`` skips the backpointer output entirely (the [T, S+1, B]
    table is never materialized in HBM) — used by the recompute-backtrace
    path's first pass, where only the carried alphas matter."""
    ll = jnp.transpose(loglikes, (1, 2, 0))  # [T, P, B]

    def step(carry, ll_t):
        a, ae, t = carry
        if with_bp:
            new_alpha, bp = _emit_step(
                a, ll_t, dev, acoustic_scale, packed,
                beam if use_beam else None)
        else:
            new_alpha = emit_value_step(a, ll_t, dev, acoustic_scale)
            if use_beam:
                best = jnp.max(new_alpha, axis=0, keepdims=True)
                new_alpha = jnp.where(new_alpha >= best - beam, new_alpha,
                                      NEG_INF)
            bp = None
        active = (t < num_frames)[None, :]
        a = jnp.where(active, new_alpha, a)
        at_end = (t + 1 == num_frames)[None, :]
        ae = jnp.where(at_end, a, ae)
        return (a, ae, t + 1), bp

    (a, ae, _), bps = jax.lax.scan(step, (alpha, alpha_at_end, t0), ll)
    return (a, ae), bps


@jax.jit
def backtrace_scan(row_start, row_src_flat, d, bps, end_state, num_frames, t0):
    """Device backtrace over one block's backpointers (frames [t0, t0+W)).

    bps [W, S+1, B] winner codes.  Returns packed global codes
    ``row * D + slot`` [W, B] int32 in forward frame order (-1 where
    inactive) and the carried state [B] at the block start.
    """
    w = bps.shape[0]
    b = bps.shape[2]
    bidx = jnp.arange(b)

    def step(carry, bp_t):
        s, t = carry
        active = t < num_frames
        code = bp_t[s, bidx].astype(jnp.int32)  # [B]
        gcode = row_start[s] * d + code
        src = row_src_flat[gcode]
        gcode_o = jnp.where(active, gcode, -1)
        s = jnp.where(active, src, s)
        return (s, t - 1), gcode_o

    (state, _), codes_rev = jax.lax.scan(
        step, (end_state, t0 + w - 1), bps[::-1])
    return codes_rev[::-1], state


@jax.jit
def select_end_state(alpha_end, final_score):
    """Device-side end-state selection (one tiny fetch instead of the full
    ``[S+1, B]`` alpha table — the remote host link runs at ~20 MB/s).

    Mirrors the reference's final-state preference
    (``lattice-faster-decoder.cc`` ``FindBestPath``): use final-weighted
    scores when any final state is reachable, else the best non-final score.
    Returns (end_state [B], score [B], use_final [B], has_path [B]).
    """
    s_real = final_score.shape[0]
    ae = alpha_end[:s_real]
    total = ae + final_score[:, None]
    best_final = jnp.max(total, axis=0)
    best_any = jnp.max(ae, axis=0)
    use_final = best_final > NEG_INF / 2
    has_path = best_any > NEG_INF / 2
    end_state = jnp.where(use_final, jnp.argmax(total, axis=0),
                          jnp.argmax(ae, axis=0)).astype(jnp.int32)
    score = jnp.where(use_final, best_final, best_any)
    return end_state, score, use_final, has_path


# device-resident backpointer budget for decode_best_path: above this the
# recompute-backtrace mode kicks in (the remote worker degrades well before
# HBM is actually full; measured in tools/prof_decode notes, VERDICT r3)
BP_BYTES_BUDGET = 2_000_000_000


def decode_best_path(graph: DenseGraph, plan: EmitPlan, dev: EmitPlanDev,
                     loglikes, num_frames, acoustic_scale: float,
                     beam: Optional[float] = None,
                     chunk: Optional[int] = None,
                     bp_bytes_budget: int = BP_BYTES_BUDGET) -> list[dict]:
    """Full 1-best decode: forward scan + device backtrace + host assembly.

    Same output structure as ``viterbi.backtrace_shared``:
    [{"tids", "words", "score", "arcs"}] per utterance.  ``chunk`` bounds the
    scan length per dispatch (memory control for very long T); chunks carry
    ``alpha`` forward and the backtrace walks them in reverse.

    When the full backpointer table ``T * (S+1) * B`` would exceed
    ``bp_bytes_budget`` (real HCLGs break uint8 bp packing — an LM-backoff
    hub state has thousands of in-degree rows — so bps are int16 and a
    [1000, 90k, 128] table is ~23 GB), the decode switches to
    **checkpoint/recompute**: pass 1 runs the forward WITHOUT materializing
    backpointers, keeping one [S+1, B] alpha snapshot per chunk; pass 2
    walks chunks in reverse, recomputing each chunk's forward WITH
    backpointers from its snapshot and backtracing it immediately, so at
    most one chunk's bp table is ever resident.  2x forward FLOPs for a
    T-fold memory cut — the standard rematerialization trade on TPU."""
    b, t_total, _p = loglikes.shape
    nf = jnp.asarray(num_frames, jnp.int32)
    alpha0 = jnp.concatenate(
        [jnp.asarray(graph.alpha0), jnp.full((1,), NEG_INF, jnp.float32)])
    acwt = jnp.float32(acoustic_scale)
    use_beam = beam is not None
    beam_j = jnp.float32(beam if use_beam else 0.0)
    s1 = plan.num_states + 1

    alpha = jnp.broadcast_to(alpha0[:, None], (s1, b))
    alpha_end = jnp.where((nf == 0)[None, :], alpha,
                          jnp.full((s1, b), NEG_INF))
    step_t = t_total if chunk is None else min(chunk, t_total)
    # pad T to a multiple of the chunk so every dispatch reuses ONE compiled
    # scan (a short remainder chunk would recompile per distinct T % chunk);
    # padded frames are masked by num_frames inside the scan
    t_pad = -(-t_total // step_t) * step_t
    if t_pad != t_total:
        loglikes = jnp.concatenate(
            [loglikes, jnp.zeros((b, t_pad - t_total, loglikes.shape[2]),
                                 loglikes.dtype)], axis=1)
    bp_bytes = t_pad * s1 * b * (1 if plan.packed else 2)
    recompute = bp_bytes > bp_bytes_budget

    chunks = []  # (lo, bps) in keep mode; (lo, alpha_snap) in recompute mode
    for lo in range(0, t_pad, step_t):
        if recompute:
            # snapshot only alpha: alpha_at_end is a pure accumulator (it
            # never feeds back into the recursion or the backpointers), so
            # pass 2 can run with a dummy — halves checkpoint residency
            chunks.append((lo, alpha))
            (alpha, alpha_end), _ = viterbi_scan(
                dev, alpha, alpha_end, loglikes[:, lo:lo + step_t], nf,
                jnp.int32(lo), acwt, beam_j, plan.packed, use_beam,
                with_bp=False)
        else:
            (alpha, alpha_end), bps = viterbi_scan(
                dev, alpha, alpha_end, loglikes[:, lo:lo + step_t], nf,
                jnp.int32(lo), acwt, beam_j, plan.packed, use_beam)
            chunks.append((lo, bps))

    # choose end state per utterance on device; fetch only [B]-sized arrays
    nf_np = np.asarray(num_frames)
    end_dev, score_dev, use_final_dev, has_path_dev = select_end_state(
        alpha_end, jnp.asarray(graph.final_score))
    end_state = np.asarray(end_dev)
    scores = np.asarray(score_dev).astype(np.float64)
    use_final = np.asarray(use_final_dev)
    has_path = np.asarray(has_path_dev)

    # backtrace chunks in reverse, carrying the state; ONE [T, B] host fetch
    # of packed codes row*D+slot
    d = jnp.int32(plan.d)
    state = end_dev
    code_parts = []
    for item in reversed(chunks):
        if recompute:
            lo, a_snap = item
            _, bps = viterbi_scan(
                dev, a_snap, a_snap, loglikes[:, lo:lo + step_t], nf,
                jnp.int32(lo), acwt, beam_j, plan.packed, use_beam)
        else:
            lo, bps = item
        codes_c, state = backtrace_scan(
            dev.row_start, dev.row_src, d, bps, state, nf, jnp.int32(lo))
        del bps  # recompute mode: at most one chunk's bp table resident
        # fetch this chunk's codes now so the buffer chain doesn't pin the
        # device queue; [W, B] int32 is tiny
        code_parts.append(np.asarray(codes_c))
    codes_all = np.concatenate(code_parts[::-1], axis=0)

    out = []
    for i in range(b):
        n = int(nf_np[i])
        if not has_path[i]:
            out.append({"tids": [], "words": [], "score": -np.inf, "arcs": []})
            continue
        codes_i = codes_all[:n, i]
        rows_i = codes_i // plan.d
        slots_i = codes_i % plan.d
        arcs = plan.row_arc[rows_i, slots_i] if n else np.zeros(0, np.int64)
        if n and (arcs < 0).any():
            out.append({"tids": [], "words": [], "score": -np.inf, "arcs": []})
            continue
        start_s = int(graph.arc_src[arcs[0]]) if n else int(end_state[i])
        words = list(graph.oseqs[graph.start_oseq[start_s]])
        for a in arcs:
            words.extend(graph.oseqs[graph.arc_oseq[a]])
        if use_final[i]:
            words.extend(graph.oseqs[graph.final_oseq[end_state[i]]])
        out.append({
            "tids": [int(t) for t in graph.arc_tid[arcs]],
            "words": words,
            "score": float(scores[i]),
            "arcs": [int(a) for a in arcs],
        })
    return out
