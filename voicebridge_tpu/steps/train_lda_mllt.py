"""LDA+MLLT triphone training.

Counterpart of the reference's ``TrainLdaMllt``
(``scr/steps/train_lda_mllt.cpp``, 1 577 LoC; SURVEY.md §2.1): from the
previous system's alignments, estimate an LDA projection over spliced
features (AliToPost -> WeightSilencePost -> AccLda -> EstLda), build a new
tree on the projected features, then run EM re-estimating a global MLLT/STC
transform on iterations ``mllt_iters`` (GmmAccMllt -> EstMllt ->
GmmTransformMeans -> ComposeTransforms), realigning on ``realign_iters``.

Features here: ``base_feats`` = CMVN'd MFCCs (13-dim); the step computes
splice(+-3) -> LDA(40) internally and returns the composed ``final_mat``
(the reference's final.mat) used at decode time.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..config import LdaOptions, SpliceOptions, TriTrainOptions
from ..data.lang import Lang
from ..fst.hclg import TrainingGraphCompiler
from ..models.transition import TransitionModel
from ..models.treebuild import acc_tree_stats, build_tree
from ..ops import gmm_kernels as K
from ..ops.features import splice_frames_batch
from ..transforms.lda import acc_lda_stats, apply_affine_transform, estimate_lda
from ..transforms.mllt import (acc_mllt_stats, compose_transforms, est_mllt,
                               transform_model_means)
from ..utils.logging import get_logger
from .align import AlignmentSet, apply_alignments
from .train_mono import TrainedModel, save_model
from .train_tri import init_model_from_tree_stats

log = get_logger()


def _batch(feats_by_utt, utts):
    b = len(utts)
    t_max = max(feats_by_utt[u].shape[0] for u in utts)
    d = feats_by_utt[utts[0]].shape[1]
    feats = np.zeros((b, t_max, d), np.float32)
    nf = np.zeros(b, np.int32)
    for i, u in enumerate(utts):
        f = feats_by_utt[u]
        feats[i, : f.shape[0]] = f
        nf[i] = f.shape[0]
    return feats, nf


def silence_frame_weights(tids, weights, trans_model, silence_phones: set,
                          silence_weight: float):
    """weight-silence-post: scale frames aligned to silence phones."""
    phones = trans_model.tid2phone[tids]
    sil = np.isin(phones, list(silence_phones))
    return np.where(sil & (weights > 0), silence_weight * weights, weights)


def train_lda_mllt(base_feats: dict, transcripts: dict, prev_alignments: dict,
                   lang: Lang, opts: TriTrainOptions = TriTrainOptions(),
                   lda_opts: LdaOptions = LdaOptions(),
                   splice_opts: SpliceOptions = SpliceOptions(),
                   prev_trans_model: TransitionModel | None = None,
                   out_dir: str | Path | None = None, mesh=None):
    """Returns (TrainedModel, final_mat [40, spliced_dim+1]).

    ``mesh``: optional jax.sharding.Mesh — routes the LDA / MLLT / tree
    statistics accumulation through the data-axis-sharded psum programs
    (SURVEY §2.6 P2; parallel/mesh.py)."""
    assert prev_trans_model is not None
    utts = sorted(base_feats)
    raw, num_frames = _batch(base_feats, utts)
    b, t_max, _ = raw.shape
    spliced = np.asarray(splice_frames_batch(raw, num_frames, splice_opts))
    sdim = spliced.shape[2]

    # previous alignments -> frame weights (silence down-weighted for LDA)
    tids0 = np.zeros((b, t_max), np.int32)
    w0 = np.zeros((b, t_max), np.float32)
    for i, u in enumerate(utts):
        a = prev_alignments.get(u) or []
        if a:
            tids0[i, : len(a)] = a
            w0[i, : len(a)] = 1.0
    sil_set = set(lang.silence_phone_ids)
    w_lda = silence_frame_weights(tids0.reshape(-1), w0.reshape(-1),
                                  prev_trans_model, sil_set,
                                  opts.silence_weight).reshape(b, t_max)

    # ---- LDA estimation ----------------------------------------------------
    pdfs0 = prev_trans_model.tid2pdf[tids0.reshape(-1)]
    counts, mean_acc, scatter = acc_lda_stats(
        jnp.asarray(spliced.reshape(b * t_max, sdim)), jnp.asarray(pdfs0),
        jnp.asarray(w_lda.reshape(-1)), prev_trans_model.num_pdfs, mesh=mesh)
    lda_mat = estimate_lda(np.asarray(counts), np.asarray(mean_acc),
                           np.asarray(scatter), lda_opts.dim,
                           lda_opts.within_class_factor)
    cur_mat = lda_mat  # final.mat so far: [40, sdim+1]
    feats = np.asarray(apply_affine_transform(jnp.asarray(spliced), cur_mat))
    dim = feats.shape[2]
    log.info("train_lda_mllt: LDA %d -> %d estimated", sdim, dim)

    # ---- tree on LDA features ---------------------------------------------
    feats_by_utt = {u: feats[i, : num_frames[i]] for i, u in enumerate(utts)}
    ali_by_utt = {u: list(tids0[i, : num_frames[i]])
                  for i, u in enumerate(utts) if w0[i].sum() > 0}
    tree_stats = acc_tree_stats(ali_by_utt, feats_by_utt, prev_trans_model,
                                opts.context_width, opts.central_position,
                                ci_phones=sil_set, mesh=mesh)
    tree = build_tree(tree_stats, lang, opts.context_width,
                      opts.central_position, num_leaves=opts.num_leaves)
    trans_model = TransitionModel(lang.topo, tree)
    am = init_model_from_tree_stats(tree, tree_stats,
                                    min_variance=opts.min_variance)
    log.info("train_lda_mllt: tree has %d leaves; %d tids", tree.num_pdfs,
             trans_model.num_transition_ids)

    # convert alignments
    tids = np.zeros((b, t_max), np.int32)
    weights = np.zeros((b, t_max), np.float32)
    for i, u in enumerate(utts):
        a = prev_alignments.get(u) or []
        if a:
            conv = prev_trans_model.convert_alignment(
                a, trans_model, opts.context_width, opts.central_position)
            tids[i, : len(conv)] = conv
            weights[i, : len(conv)] = 1.0

    compiler = TrainingGraphCompiler(lang, tree, trans_model,
                                     opts.transition_scale, opts.self_loop_scale)
    fsts = compiler.compile_batch([transcripts[u] for u in utts])
    aset = AlignmentSet.from_fsts(fsts, trans_model)

    silence_pdfs = sorted({pdf for p in lang.silence_phone_ids
                           for c in range(lang.topo.num_pdf_classes(p))
                           for pdf in tree.possible_pdfs(p, c)})

    num_gauss = am.num_gauss
    inc_gauss = max((opts.totgauss - num_gauss) // opts.max_iter_inc, 0)

    for it in range(1, opts.num_iters + 1):
        if it in opts.realign_iters:
            align_am = (am.boost_silence(silence_pdfs, opts.boost_silence)
                        if opts.boost_silence != 1.0 else am)
            results = aset.align_feats(K.pack_gmm(align_am), feats, num_frames,
                                       acoustic_scale=opts.acoustic_scale)
            apply_alignments(results, tids, weights, num_frames,
                             "train_lda_mllt realign", names=utts)

        if it in opts.mllt_iters:
            # ---- MLLT update ---------------------------------------------
            w_m = silence_frame_weights(tids.reshape(-1), weights.reshape(-1),
                                        trans_model, sil_set,
                                        opts.silence_weight)
            params = K.pack_gmm(am)
            g, beta = acc_mllt_stats(
                params, jnp.asarray(am.means()), jnp.asarray(am.inv_vars),
                jnp.asarray(feats.reshape(b * t_max, dim)),
                jnp.asarray(trans_model.tid2pdf[tids.reshape(-1)]),
                jnp.asarray(w_m), mesh=mesh)
            m, impr = est_mllt(np.asarray(g), float(beta))
            log.info("train_lda_mllt iter %d: MLLT impr/frame %.5f", it, impr)
            transform_model_means(am, m)
            cur_mat = compose_transforms(m, cur_mat)
            feats = np.asarray(apply_affine_transform(jnp.asarray(spliced), cur_mat))

        params = K.pack_gmm(am)
        x = feats.reshape(b * t_max, dim)
        tflat = tids.reshape(-1)
        wflat = weights.reshape(-1)
        pdfs = trans_model.tid2pdf[tflat]
        occ, macc, vacc, ll = K.acc_gmm_stats_chunked(
            params, x, pdfs, tree.num_pdfs, wflat)
        tstats = K.acc_transition_stats(jnp.asarray(tflat),
                                        trans_model.num_transition_ids,
                                        jnp.asarray(wflat))
        if it <= opts.max_iter_inc:
            num_gauss += inc_gauss
        am.mle_update(occ, macc, vacc, opts.min_gaussian_occupancy,
                      opts.min_variance)
        am.split_to_target(num_gauss, occ, power=opts.power, seed=2000 + it)
        trans_model.mle_update(np.asarray(tstats))
        if it % 5 == 0 or it == opts.num_iters:
            log.info("train_lda_mllt iter %d: loglike/frame %.4f, num_gauss %d",
                     it, float(ll) / max(float(weights.sum()), 1.0), am.num_gauss)

    model = TrainedModel(am, trans_model, tree, lang)
    if out_dir:
        out = Path(out_dir)
        save_model(out, am, trans_model, tree)
        np.save(out / "final.mat.npy", cur_mat)
    return model, cur_mat


def lda_decode_feats(base_feats: dict, final_mat: np.ndarray,
                     splice_opts: SpliceOptions = SpliceOptions()) -> dict:
    """Apply the splice+LDA(+MLLT) chain for decoding (decode_gmm.cpp:519-550)."""
    utts = sorted(base_feats)
    feats, nf = _batch(base_feats, utts)
    spliced = splice_frames_batch(feats, nf, splice_opts)
    out = np.asarray(apply_affine_transform(spliced, final_mat))
    return {u: out[i, : nf[i]].copy() for i, u in enumerate(utts)}
