"""End-to-end monophone regression: synthetic Yes-No corpus through the whole
pipeline (features -> lang -> flat-start EM training -> HCLG -> decode -> WER).

Mirrors the reference's TestYesNo integration oracle (SURVEY.md §4.3,
expected WER ~2%); on the cleanly separable synthetic corpus we require ~0.
"""

import numpy as np
import pytest

from voicebridge_tpu.config import (DecodeOptions, FrameOptions, LangOptions,
                                    MfccOptions, MonoTrainOptions)
from voicebridge_tpu.data.lang import prepare_lang
from voicebridge_tpu.fst.hclg import mkgraph
from voicebridge_tpu.lm.arpa import arpa_to_fst
from voicebridge_tpu.lm.ngram import estimate_ngram
from voicebridge_tpu.steps.decode import Decoder
from voicebridge_tpu.steps.make_feats import make_features
from voicebridge_tpu.steps.score import compute_wer_set, score_sweep
from voicebridge_tpu.steps.train_mono import train_mono

from synth import LEXICON, SR, make_corpus


def extract_feats(corpus, opts):
    """MFCC + per-speaker CMVN + deltas (the reference's mono feature chain:
    ApplyCmvnSequence = apply-cmvn -> add-deltas, train_gmm_mono.cpp:796-844);
    each synthetic utterance is its own speaker."""
    waves = {u: wave for u, (wave, _w) in corpus.items()}
    utt2spk = {u: u for u in corpus}
    return make_features(waves, utt2spk, opts)


@pytest.fixture(scope="module")
def pipeline():
    train, test = make_corpus(num_train=24, num_test=8, seed=7)
    opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))
    train_feats = extract_feats(train, opts)
    test_feats = extract_feats(test, opts)

    lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
    w2id = lang.words.id
    transcripts = {u: [w2id(w) for w in words] for u, (_, words) in train.items()}

    topts = MonoTrainOptions(num_iters=14, totgauss=200, max_iter_inc=10,
                             realign_iters=tuple(range(1, 14)))
    model = train_mono(train_feats, transcripts, lang, topts)

    sents = [words for (_w, words) in train.values()]
    arpa = estimate_ngram(sents, order=2)
    G = arpa_to_fst(arpa, lang.words.id, lang.word_disambig_id)
    hclg = mkgraph(lang, model.tree, model.trans_model, G)
    return dict(model=model, lang=lang, hclg=hclg, test=test,
                test_feats=test_feats, train=train, train_feats=train_feats)


def _batch(feats_by_utt):
    utts = sorted(feats_by_utt)
    t_max = max(feats_by_utt[u].shape[0] for u in utts)
    d = feats_by_utt[utts[0]].shape[1]
    feats = np.zeros((len(utts), t_max, d), np.float32)
    nf = np.zeros(len(utts), np.int32)
    for i, u in enumerate(utts):
        f = feats_by_utt[u]
        feats[i, : f.shape[0]] = f
        nf[i] = f.shape[0]
    return utts, feats, nf


class TestEndToEnd:
    def test_train_decode_wer(self, pipeline):
        model, lang = pipeline["model"], pipeline["lang"]
        dec = Decoder(pipeline["hclg"], model.trans_model, model.am,
                      DecodeOptions(beam=1e9))
        utts, feats, nf = _batch(pipeline["test_feats"])
        refs = {u: list(pipeline["test"][u][1]) for u in utts}

        results = dec.decode_batch(utts, feats, nf)
        hyps = {}
        id2w = lang.words.sym
        for r in results:
            hyps[r.utt] = [id2w(w) for w in r.words]
        stats = compute_wer_set(refs, hyps)
        print("end-to-end:", stats)
        assert stats.wer <= 5.0, f"WER too high: {stats}"

    def test_lmwt_sweep_stable(self, pipeline):
        model, lang = pipeline["model"], pipeline["lang"]
        dec = Decoder(pipeline["hclg"], model.trans_model, model.am,
                      DecodeOptions(beam=1e9))
        utts, feats, nf = _batch(pipeline["test_feats"])
        refs = {u: list(pipeline["test"][u][1]) for u in utts}
        id2w = lang.words.sym
        sweep = dec.decode_sweep(utts, feats, nf, lmwts=[7, 10, 13])
        hyps_by = {w: {r.utt: [id2w(x) for x in r.words] for r in rs}
                   for w, rs in sweep.items()}
        res = score_sweep(refs, hyps_by)
        print("sweep best:", res.best_wer, "at lmwt", res.best_lmwt)
        assert res.best_wer.wer <= 5.0

    def test_nbest_and_mbr(self, pipeline):
        model, lang = pipeline["model"], pipeline["lang"]
        dec = Decoder(pipeline["hclg"], model.trans_model, model.am,
                      DecodeOptions(beam=1e9))
        utts, feats, nf = _batch(pipeline["test_feats"])
        refs = {u: list(pipeline["test"][u][1]) for u in utts}
        nb = dec.decode_nbest(utts[:4], feats[:4], nf[:4], nbest=3)
        for u in utts[:4]:
            assert nb[u], f"no n-best hypotheses for {u}"
            scores = [s for _w, s in nb[u]]
            assert scores == sorted(scores, reverse=True)
        results = dec.decode_mbr(utts[:4], feats[:4], nf[:4], nbest=3)
        id2w = lang.words.sym
        hyps = {r.utt: [id2w(w) for w in r.words] for r in results}
        stats = compute_wer_set({u: refs[u] for u in utts[:4]}, hyps)
        print("mbr:", stats)
        assert stats.wer <= 10.0

    def test_train_set_memorized(self, pipeline):
        # decoding the training set should be near-perfect
        model, lang = pipeline["model"], pipeline["lang"]
        dec = Decoder(pipeline["hclg"], model.trans_model, model.am,
                      DecodeOptions(beam=1e9))
        utts, feats, nf = _batch(pipeline["train_feats"])
        refs = {u: list(pipeline["train"][u][1]) for u in utts}
        id2w = lang.words.sym
        results = dec.decode_batch(utts, feats, nf)
        hyps = {r.utt: [id2w(w) for w in r.words] for r in results}
        stats = compute_wer_set(refs, hyps)
        print("train-set:", stats)
        assert stats.wer <= 2.0
