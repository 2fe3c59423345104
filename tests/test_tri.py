"""Triphone pipeline tests: tree building, alignment conversion, and the
mono -> tri ("train_deltas") end-to-end WER regression on the synthetic
corpus (reference oracle: TrainDeltas in TestYesNo/LibriSpeech, SURVEY.md §2.1)."""

import numpy as np
import pytest

from voicebridge_tpu.config import (DecodeOptions, FrameOptions, LangOptions,
                                    MfccOptions, MonoTrainOptions,
                                    TriTrainOptions)
from voicebridge_tpu.data.lang import prepare_lang
from voicebridge_tpu.fst.hclg import mkgraph
from voicebridge_tpu.lm.arpa import arpa_to_fst
from voicebridge_tpu.lm.ngram import estimate_ngram
from voicebridge_tpu.models.treebuild import acc_tree_stats, build_tree
from voicebridge_tpu.steps.align import align_utterances
from voicebridge_tpu.steps.decode import Decoder
from voicebridge_tpu.steps.make_feats import make_features
from voicebridge_tpu.steps.score import compute_wer_set
from voicebridge_tpu.steps.train_mono import train_mono
from voicebridge_tpu.steps.train_tri import train_tri

from synth import LEXICON, SR, make_corpus


@pytest.fixture(scope="module")
def mono_system():
    train, test = make_corpus(num_train=20, num_test=8, seed=11)
    opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))

    def feats_of(corpus):
        return make_features({u: w for u, (w, _) in corpus.items()},
                             {u: u for u in corpus}, opts)

    train_feats, test_feats = feats_of(train), feats_of(test)
    lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
    transcripts = {u: [lang.words.id(w) for w in ws]
                   for u, (_, ws) in train.items()}
    mono = train_mono(train_feats, transcripts, lang,
                      MonoTrainOptions(num_iters=10, totgauss=150,
                                       max_iter_inc=8,
                                       realign_iters=tuple(range(1, 10))))
    return dict(train=train, test=test, train_feats=train_feats,
                test_feats=test_feats, lang=lang, transcripts=transcripts,
                mono=mono)


class TestTreeBuild:
    def test_tree_stats_and_build(self, mono_system):
        s = mono_system
        ali = align_utterances(s["mono"].am, s["mono"].trans_model, s["lang"],
                               s["train_feats"], s["transcripts"],
                               acoustic_scale=0.1)
        assert sum(1 for a in ali.values() if a) >= len(ali) - 1
        sil = set(s["lang"].silence_phone_ids)
        stats = acc_tree_stats(ali, s["train_feats"], s["mono"].trans_model,
                               ci_phones=sil)
        assert stats
        # every event window has the central phone set
        for (window, pdf_class), st in stats.items():
            assert len(window) == 3 and window[1] != 0
            assert st.count > 0
        tree = build_tree(stats, s["lang"], num_leaves=100)
        assert tree.num_pdfs >= 10
        # tree must map every seen event to a leaf
        for (window, pdf_class) in stats:
            pdf = tree.map(window, pdf_class)
            assert 0 <= pdf < tree.num_pdfs
        # silence stays context-independent: same pdf for any context
        silp = next(iter(sil))
        a = tree.map((0, silp, 0), 0)
        ph = [p for p in s["lang"].phone_ids if p not in sil][0]
        b = tree.map((ph, silp, ph), 0)
        assert a == b

    def test_convert_alignment_roundtrip(self, mono_system):
        s = mono_system
        ali = align_utterances(s["mono"].am, s["mono"].trans_model, s["lang"],
                               s["train_feats"], s["transcripts"],
                               acoustic_scale=0.1)
        sil = set(s["lang"].silence_phone_ids)
        stats = acc_tree_stats(ali, s["train_feats"], s["mono"].trans_model,
                               ci_phones=sil)
        tree = build_tree(stats, s["lang"], num_leaves=80)
        from voicebridge_tpu.models.transition import TransitionModel
        tm2 = TransitionModel(s["lang"].topo, tree)
        utt = next(u for u, a in ali.items() if a)
        tids2 = s["mono"].trans_model.convert_alignment(ali[utt], tm2)
        assert len(tids2) == len(ali[utt])
        # phone sequence preserved
        p1 = [int(s["mono"].trans_model.tid2phone[t]) for t in ali[utt]]
        p2 = [int(tm2.tid2phone[t]) for t in tids2]
        assert p1 == p2


class TestTriEndToEnd:
    def test_mono_to_tri_wer(self, mono_system):
        s = mono_system
        lang, mono = s["lang"], s["mono"]
        ali = align_utterances(mono.am, mono.trans_model, lang,
                               s["train_feats"], s["transcripts"],
                               acoustic_scale=0.1)
        tri = train_tri(s["train_feats"], s["transcripts"], ali, lang,
                        TriTrainOptions(num_iters=10, num_leaves=120,
                                        totgauss=300, max_iter_inc=8,
                                        realign_iters=(2, 4, 6, 8)),
                        prev_trans_model=mono.trans_model)
        arpa = estimate_ngram([ws for (_w, ws) in s["train"].values()], order=2)
        g = arpa_to_fst(arpa, lang.words.id, lang.word_disambig_id)
        hclg = mkgraph(lang, tri.tree, tri.trans_model, g)
        dec = Decoder(hclg, tri.trans_model, tri.am, DecodeOptions(beam=1e9))
        utts = sorted(s["test_feats"])
        t_max = max(f.shape[0] for f in s["test_feats"].values())
        feats = np.zeros((len(utts), t_max, 39), np.float32)
        nf = np.zeros(len(utts), np.int32)
        for i, u in enumerate(utts):
            f = s["test_feats"][u]
            feats[i, : f.shape[0]] = f
            nf[i] = f.shape[0]
        res = dec.decode_batch(utts, feats, nf)
        hyps = {r.utt: [lang.words.sym(w) for w in r.words] for r in res}
        refs = {u: list(s["test"][u][1]) for u in utts}
        stats = compute_wer_set(refs, hyps)
        print("tri end-to-end:", stats)
        assert stats.wer <= 5.0, f"tri WER too high: {stats}"
