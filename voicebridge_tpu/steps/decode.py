"""Decoding: batched Viterbi over the shared HCLG decode graph.

Counterpart of the reference's ``Decode`` step (``scr/steps/decode_gmm.cpp``,
call trace SURVEY.md §3.2) with ``gmm-latgen-faster``'s role played by the
arc-parallel device Viterbi (``ops/viterbi.py``).

LM-weight sweep design: the reference decodes ONCE into lattices and rescales
them per LMWT (``score_kaldi_wer.cpp:279-289``).  Exact Viterbi re-decoding at
each acoustic scale is affordable on TPU (the forward pass is a fused scan) and
is *exact* per scale, so the sweep here re-runs the scan per LMWT — each run is
the same compiled kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..config import DecodeOptions
from ..fst.core import Fst
from ..models.gmm import AmDiagGmm
from ..models.transition import TransitionModel
from ..ops import gmm_kernels as K
from ..ops import viterbi as V
from ..utils.logging import get_logger

log = get_logger()


@dataclass
class DecodeResult:
    utt: str
    words: list  # word ids
    score: float
    tids: list = field(default_factory=list)


class Decoder:
    def __init__(self, hclg: Fst, trans_model: TransitionModel, am: AmDiagGmm,
                 opts: DecodeOptions = DecodeOptions()):
        self.graph = V.compile_dense_graph(hclg, trans_model.tid2pdf)
        self.levels = V.build_reduction_plan(self.graph.arc_dst,
                                             self.graph.num_states, k=8).levels
        self.trans_model = trans_model
        self.opts = opts
        self.params = K.pack_gmm(am)
        log.info("decoder: graph states=%d arcs(eps-free)=%d reduce-depth=%d",
                 self.graph.num_states, self.graph.num_arcs, len(self.levels))

    def decode_batch(self, utts: list[str], feats: np.ndarray,
                     num_frames: np.ndarray,
                     acoustic_scale: float | None = None,
                     keep_tids: bool = False) -> list[DecodeResult]:
        """feats [B, T, D] padded; returns per-utterance best paths."""
        acwt = self.opts.acoustic_scale if acoustic_scale is None else acoustic_scale
        g = self.graph
        ll = K.loglikes_batch(self.params, jnp.asarray(feats))
        # memory-bounded two-phase decode: snapshots instead of [T,B,S] bps
        paths = V.viterbi_decode_windowed(
            g, self.levels, ll, np.asarray(num_frames),
            acoustic_scale=acwt, beam=self.opts.beam,
            window=min(64, max(8, int(np.max(num_frames)))),
            max_active=self.opts.max_active)
        out = []
        for u, r in zip(utts, paths):
            out.append(DecodeResult(u, r["words"], r["score"],
                                    r["tids"] if keep_tids else []))
        return out

    def decode_sweep(self, utts: list[str], feats: np.ndarray,
                     num_frames: np.ndarray, lmwts: list[int]) -> dict:
        """Exact best-path per LM weight: {lmwt: [DecodeResult]}."""
        return {w: self.decode_batch(utts, feats, num_frames,
                                     acoustic_scale=1.0 / w)
                for w in lmwts}

    def decode_nbest(self, utts: list[str], feats: np.ndarray,
                     num_frames: np.ndarray, nbest: int = 4,
                     acoustic_scale: float | None = None) -> dict:
        """Exact N-best decoding (lattice-nbest role): utt -> list of
        (words, score) hypotheses.  Full backpointers are stored, so use
        rescoring-scale batches."""
        acwt = self.opts.acoustic_scale if acoustic_scale is None else acoustic_scale
        g = self.graph
        ll = K.loglikes_batch(self.params, jnp.asarray(feats))
        alpha_end, bpa, bps = V.viterbi_nbest_forward(
            jnp.asarray(g.arc_src), self.levels, jnp.asarray(g.arc_pdf),
            jnp.asarray(g.arc_score), jnp.asarray(g.alpha0), ll,
            jnp.asarray(num_frames), np.float32(acwt),
            np.float32(self.opts.beam), g.num_states, nbest)
        hyps = V.backtrace_nbest(g, alpha_end, bpa, bps,
                                 np.asarray(num_frames), nbest)
        return {u: [(h["words"], h["score"]) for h in hs]
                for u, hs in zip(utts, hyps)}

    def decode_mbr(self, utts: list[str], feats: np.ndarray,
                   num_frames: np.ndarray, nbest: int = 4) -> list[DecodeResult]:
        """MBR consensus decoding from N-best hypotheses
        (lattice-mbr-decode role)."""
        from .mbr import mbr_decode

        nb = self.decode_nbest(utts, feats, num_frames, nbest)
        out = []
        for u in utts:
            words, _conf = mbr_decode(nb[u])
            score = nb[u][0][1] if nb[u] else -np.inf
            out.append(DecodeResult(u, words, score))
        return out
