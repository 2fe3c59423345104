"""End-to-end LDA+MLLT and SAT/fMLLR pipelines on the synthetic corpus
(reference oracles: TrainLdaMllt / TrainSat / DecodeFmllr, SURVEY.md §2.1)."""

import numpy as np
import pytest

from voicebridge_tpu.config import (DecodeOptions, FmllrDecodeOptions,
                                    FrameOptions, LangOptions, MfccOptions,
                                    MonoTrainOptions, SpliceOptions,
                                    TriTrainOptions)
from voicebridge_tpu.data.lang import prepare_lang
from voicebridge_tpu.fst.hclg import mkgraph
from voicebridge_tpu.lm.arpa import arpa_to_fst
from voicebridge_tpu.lm.ngram import estimate_ngram
from voicebridge_tpu.steps.align import align_utterances
from voicebridge_tpu.steps.decode import Decoder
from voicebridge_tpu.steps.decode_fmllr import decode_fmllr
from voicebridge_tpu.steps.make_feats import (apply_feature_chain,
                                              compute_cmvn, compute_mfcc)
from voicebridge_tpu.steps.score import compute_wer_set
from voicebridge_tpu.steps.train_lda_mllt import (lda_decode_feats,
                                                  train_lda_mllt)
from voicebridge_tpu.steps.train_mono import train_mono
from voicebridge_tpu.steps.train_sat import train_sat

from synth import LEXICON, SR, make_speaker_corpus


@pytest.fixture(scope="module")
def system():
    train, test, utt2spk = make_speaker_corpus(num_speakers=4,
                                               utts_per_speaker=6,
                                               num_test_per=2, seed=3)
    opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))
    all_waves = {u: w for u, (w, _) in {**train, **test}.items()}
    mfcc = compute_mfcc(all_waves, opts)
    cmvn = compute_cmvn(mfcc, utt2spk)
    # base features: CMVN'd 13-dim MFCC (for LDA and SAT-on-delta paths)
    cmvn_feats = apply_feature_chain(mfcc, utt2spk, cmvn, deltas=None)
    delta_feats = apply_feature_chain(mfcc, utt2spk, cmvn)

    lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
    transcripts = {u: [lang.words.id(w) for w in ws]
                   for u, (_, ws) in train.items()}
    tr_delta = {u: delta_feats[u] for u in train}
    mono = train_mono(tr_delta, transcripts, lang,
                      MonoTrainOptions(num_iters=10, totgauss=150,
                                       max_iter_inc=8,
                                       realign_iters=tuple(range(1, 10))))
    ali = align_utterances(mono.am, mono.trans_model, lang, tr_delta,
                           transcripts, acoustic_scale=0.1)
    arpa = estimate_ngram([ws for (_w, ws) in train.values()], order=2)
    g = arpa_to_fst(arpa, lang.words.id, lang.word_disambig_id)
    return dict(train=train, test=test, utt2spk=utt2spk, lang=lang,
                transcripts=transcripts, mono=mono, ali=ali, g=g,
                cmvn_feats=cmvn_feats, delta_feats=delta_feats)


def _batch(feats_by_utt, utts):
    t_max = max(feats_by_utt[u].shape[0] for u in utts)
    d = feats_by_utt[utts[0]].shape[1]
    feats = np.zeros((len(utts), t_max, d), np.float32)
    nf = np.zeros(len(utts), np.int32)
    for i, u in enumerate(utts):
        f = feats_by_utt[u]
        feats[i, : f.shape[0]] = f
        nf[i] = f.shape[0]
    return feats, nf


def _wer(lang, results, refs):
    hyps = {r.utt: [lang.words.sym(w) for w in r.words] for r in results}
    return compute_wer_set(refs, hyps)


class TestLdaMllt:
    def test_lda_mllt_end_to_end(self, system):
        s = system
        lang = s["lang"]
        base_train = {u: s["cmvn_feats"][u] for u in s["train"]}
        model, final_mat = train_lda_mllt(
            base_train, s["transcripts"], s["ali"], lang,
            TriTrainOptions(num_iters=8, num_leaves=100, totgauss=300,
                            max_iter_inc=6, realign_iters=(2, 4, 6),
                            mllt_iters=(2, 4)),
            prev_trans_model=s["mono"].trans_model)
        assert final_mat.shape[0] == 40
        hclg = mkgraph(lang, model.tree, model.trans_model, s["g"])
        dec = Decoder(hclg, model.trans_model, model.am, DecodeOptions(beam=1e9))
        base_test = {u: s["cmvn_feats"][u] for u in s["test"]}
        test_feats = lda_decode_feats(base_test, final_mat)
        utts = sorted(test_feats)
        feats, nf = _batch(test_feats, utts)
        res = dec.decode_batch(utts, feats, nf)
        refs = {u: list(s["test"][u][1]) for u in utts}
        stats = _wer(lang, res, refs)
        print("lda+mllt end-to-end:", stats)
        assert stats.wer <= 10.0


class TestSat:
    def test_sat_fmllr_end_to_end(self, system):
        s = system
        lang = s["lang"]
        tr_delta = {u: s["delta_feats"][u] for u in s["train"]}
        sat = train_sat(tr_delta, s["utt2spk"], s["transcripts"], s["ali"],
                        s["mono"].am, lang,
                        TriTrainOptions(num_iters=8, num_leaves=100,
                                        totgauss=300, max_iter_inc=6,
                                        realign_iters=(3, 5, 7),
                                        fmllr_iters=(2, 4, 6)),
                        prev_trans_model=s["mono"].trans_model)
        model = sat.model
        hclg = mkgraph(lang, model.tree, model.trans_model, s["g"])
        te_delta = {u: s["delta_feats"][u] for u in s["test"]}
        utts = sorted(te_delta)
        feats, nf = _batch(te_delta, utts)
        refs = {u: list(s["test"][u][1]) for u in utts}
        results, trans = decode_fmllr(
            hclg, model.trans_model, model.am, sat.alimdl, lang,
            utts, feats, nf, s["utt2spk"],
            FmllrDecodeOptions(beam=1e9, first_beam=1e9, fmllr_min_count=50.0))
        stats = _wer(lang, results, refs)
        print("sat+fmllr end-to-end:", stats)
        assert stats.wer <= 10.0
        # transforms deviate from identity (speakers are warped)
        d = feats.shape[2]
        dev = np.abs(trans[:, :, :d] - np.eye(d)[None]).max()
        assert dev > 0.01


class TestSatOverLda:
    def test_lda_mllt_sat_end_to_end(self, system):
        """The reference's tri3b config: SAT/fMLLR trained over the
        spliced+LDA+MLLT feature space (TrainSat on tri2b alignments,
        LibriSpeech.cpp:514-543), decoded with DecodeFmllr on LDA test
        features."""
        s = system
        lang = s["lang"]
        base_train = {u: s["cmvn_feats"][u] for u in s["train"]}
        opts = TriTrainOptions(num_iters=8, num_leaves=100, totgauss=300,
                               max_iter_inc=6, realign_iters=(2, 4, 6),
                               mllt_iters=(2, 4), fmllr_iters=(2, 4, 6))
        tri2b, final_mat = train_lda_mllt(
            base_train, s["transcripts"], s["ali"], lang, opts,
            prev_trans_model=s["mono"].trans_model)
        lda_train = lda_decode_feats(base_train, final_mat)
        ali2 = align_utterances(tri2b.am, tri2b.trans_model, lang, lda_train,
                                s["transcripts"], acoustic_scale=0.1)
        sat = train_sat(lda_train, s["utt2spk"], s["transcripts"], ali2,
                        tri2b.am, lang, opts,
                        prev_trans_model=tri2b.trans_model)
        model = sat.model
        hclg = mkgraph(lang, model.tree, model.trans_model, s["g"])
        base_test = {u: s["cmvn_feats"][u] for u in s["test"]}
        lda_test = lda_decode_feats(base_test, final_mat)
        utts = sorted(lda_test)
        feats, nf = _batch(lda_test, utts)
        refs = {u: list(s["test"][u][1]) for u in utts}
        results, trans = decode_fmllr(
            hclg, model.trans_model, model.am, sat.alimdl, lang,
            utts, feats, nf, s["utt2spk"],
            FmllrDecodeOptions(beam=1e9, first_beam=1e9,
                               fmllr_min_count=50.0))
        stats = _wer(lang, results, refs)
        print("lda+mllt+sat end-to-end:", stats)
        assert stats.wer <= 10.0
        d = feats.shape[2]
        dev = np.abs(trans[:, :, :d] - np.eye(d)[None]).max()
        assert dev > 0.01
