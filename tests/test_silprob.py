"""Silence-probability lexicon tests: get_prons stats -> silprob lang ->
retrain/decode keeps WER (reference silprob branch of prepare_lang +
GetProns, SURVEY §2.1)."""

import numpy as np
import pytest

from voicebridge_tpu.config import (DecodeOptions, FrameOptions, LangOptions,
                                    MfccOptions, MonoTrainOptions)
from voicebridge_tpu.data.lang import prepare_lang, validate_lang
from voicebridge_tpu.fst.hclg import mkgraph
from voicebridge_tpu.fst.lexicon import silprobs_from_stats
from voicebridge_tpu.lm.arpa import arpa_to_fst
from voicebridge_tpu.lm.ngram import estimate_ngram
from voicebridge_tpu.steps.align import align_utterances
from voicebridge_tpu.steps.decode import Decoder
from voicebridge_tpu.steps.get_prons import (estimate_silence_probs, get_prons)
from voicebridge_tpu.steps.make_feats import make_features
from voicebridge_tpu.steps.score import compute_wer_set
from voicebridge_tpu.steps.train_mono import train_mono

from synth import LEXICON, SR, make_corpus


class TestSilprobPipeline:
    def test_silprob_lang_end_to_end(self):
        train, test = make_corpus(num_train=16, num_test=6, seed=31)
        opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))

        def feats_of(c):
            return make_features({u: w for u, (w, _) in c.items()},
                                 {u: u for u in c}, opts)

        tf, sf = feats_of(train), feats_of(test)
        lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
        tr = {u: [lang.words.id(w) for w in ws] for u, (_, ws) in train.items()}
        mono = train_mono(tf, tr, lang, MonoTrainOptions(
            num_iters=10, totgauss=150, max_iter_inc=8,
            realign_iters=tuple(range(1, 10))))

        # pron/silence stats from alignments
        ali = align_utterances(mono.am, mono.trans_model, lang, tf, tr,
                               acoustic_scale=0.1)
        words_by_utt = {u: list(ws) for u, (_, ws) in train.items()}
        base_lex = {w: [(p, pr) for (p, pr) in prons]
                    for w, prons in LEXICON.items()}
        pron_counts, sil_stats = get_prons(ali, words_by_utt, mono.trans_model,
                                           lang, base_lex)
        assert pron_counts, "no pronunciation counts"
        sp = estimate_silence_probs(sil_stats)
        assert 0.0 < sp["overall"] < 1.0
        silprobs = silprobs_from_stats(sil_stats, sp["overall"])

        # rebuild lang with word-dependent silence probabilities
        lang2 = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions(),
                             silprobs=silprobs)
        assert not validate_lang(lang2)
        # retrain quickly on the silprob lang and decode
        tr2 = {u: [lang2.words.id(w) for w in ws]
               for u, (_, ws) in train.items()}
        mono2 = train_mono(tf, tr2, lang2, MonoTrainOptions(
            num_iters=8, totgauss=120, max_iter_inc=6,
            realign_iters=tuple(range(1, 8))))
        arpa = estimate_ngram([ws for (_w, ws) in train.values()], order=2)
        g = arpa_to_fst(arpa, lang2.words.id, lang2.word_disambig_id)
        hclg = mkgraph(lang2, mono2.tree, mono2.trans_model, g)
        dec = Decoder(hclg, mono2.trans_model, mono2.am, DecodeOptions(beam=1e9))
        utts = sorted(sf)
        t_max = max(f.shape[0] for f in sf.values())
        feats = np.zeros((len(utts), t_max, 39), np.float32)
        nf = np.zeros(len(utts), np.int32)
        for i, u in enumerate(utts):
            f = sf[u]
            feats[i, : f.shape[0]] = f
            nf[i] = f.shape[0]
        res = dec.decode_batch(utts, feats, nf)
        hyps = {r.utt: [lang2.words.sym(w) for w in r.words] for r in res}
        refs = {u: list(test[u][1]) for u in utts}
        stats = compute_wer_set(refs, hyps)
        print("silprob end-to-end:", stats)
        assert stats.wer <= 10.0
