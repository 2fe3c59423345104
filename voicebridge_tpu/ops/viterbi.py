"""Device-resident Viterbi over WFSTs: batched max-plus scans on TPU.

Replaces the reference's token-passing decoders (``FasterDecoder`` for
alignment, ``LatticeFasterDecoder`` for decoding,
``decoder/lattice-faster-decoder.cc:72-89``) with a TPU-native formulation:

* Host side, offline: the graph's input-epsilon arcs are eliminated by
  epsilon-closure expansion (word outputs along closure paths preserved as
  "output sequence" ids), so every surviving arc consumes exactly one frame.
* Device side: Viterbi is a ``lax.scan`` over frames; each step is an
  arc-parallel relaxation — gather source scores, add graph weight and the
  frame's acoustic score for the arc's pdf, ``segment_max`` into destination
  states.  All utterances in a batch advance in lockstep ([B, S] state scores),
  which is what keeps the MXU/VPU busy instead of a pointer-chasing token list.
* Backtraces are recovered from per-frame argmax arcs host-side (cheap).

Scores are in the max-plus (= negated tropical) domain: higher is better.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fst.core import EPS, Fst, ZERO

NEG_INF = -1.0e30


class DenseGraph(NamedTuple):
    """Epsilon-free flat graph for the device decoder.  numpy/host fields
    ``oseqs`` hold word-output sequences referenced by arc/final/start ids."""

    num_states: int
    arc_src: np.ndarray  # [A] int32
    arc_dst: np.ndarray  # [A] int32
    arc_tid: np.ndarray  # [A] int32 (transition-id = graph input label)
    arc_pdf: np.ndarray  # [A] int32
    arc_score: np.ndarray  # [A] f32 (= -graph cost)
    arc_oseq: np.ndarray  # [A] int32 index into oseqs
    alpha0: np.ndarray  # [S] f32 initial scores (= -closure cost from start)
    start_oseq: np.ndarray  # [S] int32
    final_score: np.ndarray  # [S] f32 (= -final cost, NEG_INF if not final)
    final_oseq: np.ndarray  # [S] int32
    oseqs: list  # list[tuple[int]] — oseqs[0] = ()

    @property
    def num_arcs(self) -> int:
        return len(self.arc_src)


def _eps_closure_with_outputs(fst: Fst, state: int):
    """Best-cost closure over input-eps arcs from ``state``: returns
    {dest: (cost, olabels_tuple)} including (state, (0.0, ()))."""
    import heapq

    best: dict[int, tuple[float, tuple]] = {state: (0.0, ())}
    heap = [(0.0, state, ())]
    while heap:
        c, s, ostr = heapq.heappop(heap)
        if c > best[s][0] + 1e-12:
            continue
        for a in fst.arcs[s]:
            if a.ilabel != EPS:
                continue
            nc = c + a.weight
            no = ostr + ((a.olabel,) if a.olabel != EPS else ())
            cur = best.get(a.nextstate)
            if cur is None or nc < cur[0] - 1e-12:
                best[a.nextstate] = (nc, no)
                heapq.heappush(heap, (nc, a.nextstate, no))
    return best


def compile_dense_graph(fst: Fst, tid2pdf: np.ndarray) -> DenseGraph:
    """Flatten an HCLG-style FST (input = transition-ids, output = words) into
    an epsilon-free arc-parallel form."""
    n = fst.num_states
    oseq_ids: dict[tuple, int] = {(): 0}
    oseqs: list[tuple] = [()]

    def oseq_id(t: tuple) -> int:
        if t not in oseq_ids:
            oseq_ids[t] = len(oseqs)
            oseqs.append(t)
        return oseq_ids[t]

    closures = [_eps_closure_with_outputs(fst, s) for s in range(n)]

    src, dst, tid, wt, osq = [], [], [], [], []
    for s in range(n):
        for a in fst.arcs[s]:
            if a.ilabel == EPS:
                continue
            base_o = (a.olabel,) if a.olabel != EPS else ()
            for x, (c, ostr) in closures[a.nextstate].items():
                src.append(s)
                dst.append(x)
                tid.append(a.ilabel)
                wt.append(-(a.weight + c))
                osq.append(oseq_id(base_o + ostr))

    alpha0 = np.full(n, NEG_INF, dtype=np.float32)
    start_oseq = np.zeros(n, dtype=np.int32)
    if fst.start >= 0:
        for x, (c, ostr) in closures[fst.start].items():
            if -c > alpha0[x]:
                alpha0[x] = -c
                start_oseq[x] = oseq_id(ostr)

    final_score = np.full(n, NEG_INF, dtype=np.float32)
    final_oseq = np.zeros(n, dtype=np.int32)
    for s in range(n):
        for x, (c, ostr) in closures[s].items():
            if fst.finals[x] != ZERO:
                sc = -(c + fst.finals[x])
                if sc > final_score[s]:
                    final_score[s] = sc
                    final_oseq[s] = oseq_id(ostr)

    arc_tid = np.asarray(tid, dtype=np.int32)
    return DenseGraph(
        num_states=n,
        arc_src=np.asarray(src, dtype=np.int32),
        arc_dst=np.asarray(dst, dtype=np.int32),
        arc_tid=arc_tid,
        arc_pdf=tid2pdf[arc_tid].astype(np.int32),
        arc_score=np.asarray(wt, dtype=np.float32),
        arc_oseq=np.asarray(osq, dtype=np.int32),
        alpha0=alpha0,
        start_oseq=start_oseq,
        final_score=final_score,
        final_oseq=final_oseq,
        oseqs=oseqs,
    )


def pad_graphs(graphs: list[DenseGraph], pad_states: Optional[int] = None,
               pad_arcs: Optional[int] = None):
    """Stack per-utterance graphs into padded batch arrays (for training
    alignment, where every utterance has its own graph).  Padding arcs point
    from/to a dead padding state with NEG_INF score."""
    s_max = pad_states or max(g.num_states for g in graphs)
    a_max = pad_arcs or max(g.num_arcs for g in graphs)
    s_pad = s_max + 1  # last state = dead state
    b = len(graphs)

    def pad_arc(field, fill, dtype):
        out = np.full((b, a_max), fill, dtype=dtype)
        for i, g in enumerate(graphs):
            out[i, : g.num_arcs] = getattr(g, field)
        return out

    arc_src = pad_arc("arc_src", s_max, np.int32)
    arc_dst = pad_arc("arc_dst", s_max, np.int32)
    arc_tid = pad_arc("arc_tid", 0, np.int32)
    arc_pdf = pad_arc("arc_pdf", 0, np.int32)
    arc_score = pad_arc("arc_score", NEG_INF, np.float32)
    arc_oseq = pad_arc("arc_oseq", 0, np.int32)

    def pad_state(field, fill, dtype):
        out = np.full((b, s_pad), fill, dtype=dtype)
        for i, g in enumerate(graphs):
            out[i, : g.num_states] = getattr(g, field)
        return out

    alpha0 = pad_state("alpha0", NEG_INF, np.float32)
    final_score = pad_state("final_score", NEG_INF, np.float32)
    return dict(
        arc_src=arc_src, arc_dst=arc_dst, arc_tid=arc_tid, arc_pdf=arc_pdf,
        arc_score=arc_score, arc_oseq=arc_oseq, alpha0=alpha0,
        final_score=final_score, num_states=s_pad,
    )


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


def _relax(alpha_src_scores: jnp.ndarray, seg_ids: jnp.ndarray, num_seg: int,
           arc_index: jnp.ndarray):
    """segment_max + argmax-arc.  alpha_src_scores [..., A]; returns
    (new_scores [..., num_seg], best_arc [..., num_seg])."""
    amax = jax.ops.segment_max(alpha_src_scores, seg_ids, num_seg)
    amax = jnp.maximum(amax, NEG_INF)  # segment_max yields -inf for empty segs
    is_best = alpha_src_scores >= amax[seg_ids] - 1e-6
    winner = jnp.where(is_best, arc_index, -1)
    best_arc = jax.ops.segment_max(winner, seg_ids, num_seg)
    return amax, best_arc


@functools.partial(jax.jit, static_argnames=("num_states",))
def viterbi_forward_shared(arc_src, arc_dst, arc_pdf, arc_score, alpha0,
                           loglikes, num_frames, acoustic_scale, beam,
                           num_states: int):
    """Shared decode graph, batched utterances.

    arc_*: [A]; alpha0 [S]; loglikes [B, T, P]; num_frames [B].
    Returns (alpha_final [B, S] at each utterance's own end, bp [T, B, S]).
    """
    b = loglikes.shape[0]
    a_idx = jnp.arange(arc_src.shape[0], dtype=jnp.int32)

    def step(carry, inp):
        alpha, alpha_at_end, t = carry
        ll_t = inp  # [B, P]
        am = ll_t[:, arc_pdf] * acoustic_scale  # [B, A]
        score = alpha[:, arc_src] + arc_score[None, :] + am  # [B, A]
        new_alpha, bp = jax.vmap(
            lambda sc: _relax(sc, arc_dst, num_states, a_idx))(score)
        best = jnp.max(new_alpha, axis=1, keepdims=True)
        new_alpha = jnp.where(new_alpha >= best - beam, new_alpha, NEG_INF)
        active = (t < num_frames)[:, None]  # [B, 1]
        alpha = jnp.where(active, new_alpha, alpha)
        # snapshot alpha at the utterance's last frame
        at_end = (t + 1 == num_frames)[:, None]
        alpha_at_end = jnp.where(at_end, alpha, alpha_at_end)
        return (alpha, alpha_at_end, t + 1), bp

    alpha_init = jnp.broadcast_to(alpha0[None, :], (b, num_states))
    zero_end = jnp.where(
        (num_frames == 0)[:, None], alpha_init, jnp.full((b, num_states), NEG_INF))
    (_, alpha_end, _), bps = jax.lax.scan(
        step, (alpha_init, zero_end, jnp.int32(0)),
        jnp.swapaxes(loglikes, 0, 1))
    return alpha_end, bps


@functools.partial(jax.jit, static_argnames=("num_states",))
def viterbi_forward_batched(arc_src, arc_dst, arc_pdf, arc_score, alpha0,
                            loglikes, num_frames, acoustic_scale, beam,
                            num_states: int):
    """Per-utterance graphs (training alignment): arc_* [B, A], alpha0 [B, S],
    loglikes [B, T, P].  Returns (alpha_end [B, S], bp [T, B, S])."""
    b, a = arc_src.shape
    s = num_states
    flat_dst = (jnp.arange(b, dtype=jnp.int32)[:, None] * s + arc_dst).reshape(-1)
    a_idx = jnp.broadcast_to(jnp.arange(a, dtype=jnp.int32)[None, :], (b, a)).reshape(-1)

    def step(carry, inp):
        alpha, alpha_at_end, t = carry  # alpha [B, S]
        ll_t = inp  # [B, P]
        am = jnp.take_along_axis(ll_t, arc_pdf, axis=1) * acoustic_scale  # [B, A]
        src_sc = jnp.take_along_axis(alpha, arc_src, axis=1)  # [B, A]
        score = (src_sc + arc_score + am).reshape(-1)  # [B*A]
        amax, bp = _relax(score, flat_dst, b * s, a_idx)
        new_alpha = amax.reshape(b, s)
        bp = bp.reshape(b, s)
        best = jnp.max(new_alpha, axis=1, keepdims=True)
        new_alpha = jnp.where(new_alpha >= best - beam, new_alpha, NEG_INF)
        active = (t < num_frames)[:, None]
        alpha = jnp.where(active, new_alpha, alpha)
        at_end = (t + 1 == num_frames)[:, None]
        alpha_at_end = jnp.where(at_end, alpha, alpha_at_end)
        return (alpha, alpha_at_end, t + 1), bp

    zero_end = jnp.where((num_frames == 0)[:, None], alpha0,
                         jnp.full_like(alpha0, NEG_INF))
    (_, alpha_end, _), bps = jax.lax.scan(
        step, (alpha0, zero_end, jnp.int32(0)), jnp.swapaxes(loglikes, 0, 1))
    return alpha_end, bps


# ---------------------------------------------------------------------------
# Host-side backtrace
# ---------------------------------------------------------------------------


def backtrace_shared(graph: DenseGraph, alpha_end: np.ndarray, bps: np.ndarray,
                     num_frames: np.ndarray, require_final: bool = True):
    """Recover per-utterance best paths from a shared-graph forward pass.

    Returns list of dicts: {"tids": [T_b], "words": [...], "score": float,
    "arcs": [T_b]} (empty when no path)."""
    b = alpha_end.shape[0]
    out = []
    for i in range(b):
        t_end = int(num_frames[i])
        total = alpha_end[i] + graph.final_score
        if require_final and np.max(total) > NEG_INF / 2:
            s = int(np.argmax(total))
            score = float(total[s])
            final_words = graph.oseqs[graph.final_oseq[s]]
        else:
            s = int(np.argmax(alpha_end[i]))
            score = float(alpha_end[i][s])
            final_words = ()
        if alpha_end[i][s] <= NEG_INF / 2:
            out.append({"tids": [], "words": [], "score": -np.inf, "arcs": []})
            continue
        arcs = []
        ok = True
        for t in range(t_end - 1, -1, -1):
            a = int(bps[t, i, s])
            if a < 0:
                ok = False
                break
            arcs.append(a)
            s = int(graph.arc_src[a])
        if not ok:
            out.append({"tids": [], "words": [], "score": -np.inf, "arcs": []})
            continue
        arcs.reverse()
        words: list[int] = list(graph.oseqs[graph.start_oseq[s]])
        for a in arcs:
            words.extend(graph.oseqs[graph.arc_oseq[a]])
        words.extend(final_words)
        out.append({
            "tids": [int(graph.arc_tid[a]) for a in arcs],
            "words": words,
            "score": score,
            "arcs": arcs,
        })
    return out


def backtrace_batched(padded: dict, graphs: list[DenseGraph], alpha_end: np.ndarray,
                      bps: np.ndarray, num_frames: np.ndarray):
    """Backtrace for per-utterance graphs (training alignment)."""
    out = []
    arc_src = padded["arc_src"]
    for i, g in enumerate(graphs):
        t_end = int(num_frames[i])
        total = alpha_end[i, : g.num_states] + g.final_score
        if np.max(total) <= NEG_INF / 2:
            out.append({"tids": [], "words": [], "score": -np.inf, "arcs": []})
            continue
        s = int(np.argmax(total))
        score = float(total[s])
        final_words = g.oseqs[g.final_oseq[s]]
        arcs = []
        ok = True
        for t in range(t_end - 1, -1, -1):
            a = int(bps[t, i, s])
            if a < 0:
                ok = False
                break
            arcs.append(a)
            s = int(arc_src[i, a])
        if not ok:
            out.append({"tids": [], "words": [], "score": -np.inf, "arcs": []})
            continue
        arcs.reverse()
        words: list[int] = list(g.oseqs[g.start_oseq[s]])
        for a in arcs:
            words.extend(g.oseqs[g.arc_oseq[a]])
        words.extend(final_words)
        out.append({
            "tids": [int(g.arc_tid[a]) for a in arcs],
            "words": words,
            "score": score,
            "arcs": arcs,
        })
    return out
