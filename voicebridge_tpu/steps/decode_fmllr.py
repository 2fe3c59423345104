"""Two-pass speaker-adapted decoding (fMLLR).

Counterpart of the reference's ``DecodeFmllr`` (``scr/steps/decode_fmllr.cpp``,
1 299 LoC; stage trace SURVEY.md §2.1): (0) speaker-independent first pass
with ``final.alimdl``; (1) per-speaker fMLLR estimated from first-pass
hypotheses (silence down-weighted); (2) adapted decode with ``final.mdl``;
(3) second fMLLR estimate from the adapted pass + final decode.

v1 note: the reference estimates transforms from *lattice* posteriors
(LatticeToPost -> GmmPostToGpost); until device lattices land, posteriors come
from the best path's mixture posteriors — the dominant term of the lattice
posterior for well-separated beams.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..config import FmllrDecodeOptions
from ..data.lang import Lang
from ..fst.core import Fst
from ..models.gmm import AmDiagGmm
from ..models.transition import TransitionModel
from ..transforms.fmllr import (acc_fmllr_stats, apply_fmllr_batch,
                                estimate_fmllr_batch)
from ..ops import gmm_kernels as K
from ..steps.decode import Decoder, DecodeResult
from ..steps.train_lda_mllt import silence_frame_weights
from ..utils.logging import get_logger

log = get_logger()


def decode_fmllr(hclg: Fst, trans_model: TransitionModel, am: AmDiagGmm,
                 alimdl: AmDiagGmm, lang: Lang, utts: list, feats: np.ndarray,
                 num_frames: np.ndarray, utt2spk: dict,
                 opts: FmllrDecodeOptions = FmllrDecodeOptions()):
    """Returns (results list[DecodeResult], transforms [S, D, D+1])."""
    b, t_max, dim = feats.shape
    speakers = sorted({utt2spk[u] for u in utts})
    spk_idx = {s: i for i, s in enumerate(speakers)}
    spk_of_utt = np.asarray([spk_idx[utt2spk[u]] for u in utts], np.int32)
    spk_flat = np.repeat(spk_of_utt, t_max)
    sil_set = set(lang.silence_phone_ids)
    base_flat = jnp.asarray(feats.reshape(b * t_max, dim))

    def tids_and_weights(results):
        tids = np.zeros((b, t_max), np.int32)
        w = np.zeros((b, t_max), np.float32)
        for i, r in enumerate(results):
            if r.tids:
                tids[i, : len(r.tids)] = r.tids
                w[i, : len(r.tids)] = 1.0
        wflat = silence_frame_weights(tids.reshape(-1), w.reshape(-1),
                                      trans_model, sil_set,
                                      opts.silence_weight)
        return tids.reshape(-1), wflat

    def estimate(model, tids_flat, wflat):
        params = K.pack_gmm(model)
        beta, k, g = acc_fmllr_stats(
            params, jnp.asarray(model.means()), jnp.asarray(model.inv_vars),
            base_flat, jnp.asarray(trans_model.tid2pdf[tids_flat]),
            jnp.asarray(wflat), jnp.asarray(spk_flat), len(speakers))
        trans, imprs = estimate_fmllr_batch(np.asarray(beta), np.asarray(k),
                                            np.asarray(g),
                                            min_count=opts.fmllr_min_count)
        return trans, imprs

    # ---- stage 0: SI pass with alimdl --------------------------------------
    si_dec = Decoder(hclg, trans_model, alimdl, _decode_opts(opts, first=True))
    si_results = si_dec.decode_batch(utts, feats, num_frames, keep_tids=True)

    # ---- stage 1: first transforms -----------------------------------------
    tids_flat, wflat = tids_and_weights(si_results)
    trans, imprs = estimate(am, tids_flat, wflat)
    log.info("decode_fmllr: pass-1 transforms for %d speakers", len(speakers))

    # ---- stage 2: adapted decode -------------------------------------------
    adapted = np.asarray(apply_fmllr_batch(jnp.asarray(feats), trans, spk_of_utt))
    ad_dec = Decoder(hclg, trans_model, am, _decode_opts(opts, first=False))
    ad_results = ad_dec.decode_batch(utts, adapted, num_frames, keep_tids=True)

    # ---- stage 3: second estimate + final decode ---------------------------
    tids_flat, wflat = tids_and_weights(ad_results)
    trans2, _ = estimate(am, tids_flat, wflat)
    adapted2 = np.asarray(apply_fmllr_batch(jnp.asarray(feats), trans2, spk_of_utt))
    final_results = ad_dec.decode_batch(utts, adapted2, num_frames,
                                        keep_tids=True)
    return final_results, trans2


def _decode_opts(opts: FmllrDecodeOptions, first: bool):
    from ..config import DecodeOptions

    return DecodeOptions(
        beam=opts.first_beam if first else opts.beam,
        max_active=opts.first_max_active if first else opts.max_active,
        acoustic_scale=opts.acoustic_scale,
        lattice_beam=opts.lattice_beam,
    )
