"""Project API round-trip tests (VoiceBridge.h / Params / examples role):
dataset on disk -> pipeline -> WER, plus incremental resume behavior."""

import numpy as np
import pytest

from voicebridge_tpu.config import (DecodeOptions, FrameOptions, MfccOptions,
                                    MonoTrainOptions)
from voicebridge_tpu.project import Project
from voicebridge_tpu.steps.diagnostic import report_alignment_diagnostics
from voicebridge_tpu.steps.score import (ops_details, per_spk_details,
                                         wer_bootstrap_ci)
from voicebridge_tpu.utils.wave import write_wave

from synth import LEXICON, make_corpus


@pytest.fixture(scope="module")
def project(tmp_path_factory):
    work = tmp_path_factory.mktemp("proj")
    waves = work / "waves"
    train, test = make_corpus(num_train=18, num_test=6, seed=21)
    for utt, (wave, words) in {**train, **test}.items():
        write_wave(waves / "g" / f"{utt}.wav", 8000, wave)
        (waves / "g" / f"{utt}.txt").write_text(" ".join(words))
    proj = Project(work, waves_dir=waves)
    proj.prepare_data(percentage_train=75, order_ngram=2, idtype=1)
    proj.set_lexicon(LEXICON)
    proj.make_features(MfccOptions(frame_opts=FrameOptions(samp_freq=8000.0,
                                                           dither=0.0)))
    return proj


class TestProject:
    def test_mono_train_decode(self, project):
        mono = project.train_mono(MonoTrainOptions(
            num_iters=10, totgauss=150, max_iter_inc=8,
            realign_iters=tuple(range(1, 10))), name="mono")
        hclg = project.mkgraph(mono, "mono")
        res = project.decode(mono, hclg, opts=DecodeOptions(beam=1e9))
        assert res.best_wer.wer <= 10.0

    def test_model_reload_gives_same_results(self, project):
        mono = project.load_model("mono")
        hclg = project.mkgraph(mono, "mono")
        res = project.decode(mono, hclg, opts=DecodeOptions(beam=1e9))
        assert res.best_wer.wer <= 10.0

    def test_train_mono_skips_when_cached(self, project):
        import time

        t0 = time.time()
        project.train_mono(name="mono")  # should load, not retrain
        assert time.time() - t0 < 5.0

    def test_alignment_diagnostics(self, project):
        mono = project.load_model("mono")
        ali = project.align(mono)
        text = report_alignment_diagnostics(ali, mono.trans_model, project.lang,
                                            top=30)
        assert "utts" in text and "SIL" in text

    def test_scoring_details(self, project):
        refs = {"a": ["YES", "NO"], "b": ["NO"]}
        hyps = {"a": ["YES", "YES"], "b": ["NO"]}
        spk = per_spk_details(refs, hyps, {"a": "s1", "b": "s2"})
        assert spk["s1"].num_sub == 1 and spk["s2"].num_err == 0
        ops = ops_details(refs, hyps)
        assert ops[("substitution", "NO", "YES")] == 1
        lo, mid, hi = wer_bootstrap_ci(refs, hyps, num_reps=200)
        assert lo <= mid <= hi


class TestDecodeArtifacts:
    def test_artifacts_and_ctm(self, project):
        mono = project.load_model("mono")
        hclg = project.mkgraph(mono, "mono")
        res = project.decode(mono, hclg, opts=DecodeOptions(beam=1e9),
                             out_name="mono")
        out = project.exp_dir / "mono" / "decode"
        for f in ("transcription.txt", "wer_table.txt", "per_utt_details.txt",
                  "lattice_depth.txt", "ctm"):
            assert (out / f).exists(), f
        # CTM rows: utt chan start dur word, nonneg non-overlapping times
        hyp = {}
        last_end = {}
        for line in (out / "ctm").read_text().splitlines():
            utt, chan, start, dur, word = line.split()
            start, dur = float(start), float(dur)
            assert dur > 0 and start >= last_end.get(utt, 0.0) - 1e-6
            last_end[utt] = start + dur
            hyp.setdefault(utt, []).append(word)
        # CTM word sequences match the written transcriptions
        for line in (out / "transcription.txt").read_text().splitlines():
            utt, *words = line.split()
            if words:
                assert hyp.get(utt) == words, (utt, hyp.get(utt), words)
