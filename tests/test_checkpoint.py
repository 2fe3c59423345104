"""Checkpoint/resume tests (SURVEY.md §5.4 role)."""

import numpy as np
import pytest

from voicebridge_tpu.config import (FrameOptions, LangOptions, MfccOptions,
                                    MonoTrainOptions)
from voicebridge_tpu.data.lang import prepare_lang
from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.steps.make_feats import make_features
from voicebridge_tpu.steps.train_mono import train_mono
from voicebridge_tpu.utils.checkpoint import TrainCheckpoint

from synth import LEXICON, SR, make_corpus


class TestCheckpoint:
    def test_save_load_prune(self, tmp_path):
        rng = np.random.default_rng(0)
        am = AmDiagGmm.flat_start(5, rng.standard_normal(4), np.ones(4))
        ck = TrainCheckpoint(tmp_path, keep=2)
        for it in (1, 2, 3, 4):
            ck.save(it, am, np.zeros(7, np.float32),
                    np.full((2, 3), it, np.int32), np.ones((2, 3), np.float32),
                    {"num_gauss_target": 10 + it})
        state = ck.latest()
        assert state["iteration"] == 4
        assert state["meta"]["num_gauss_target"] == 14
        assert (state["tids"] == 4).all()
        # pruned to `keep`
        assert len(list(tmp_path.glob("iter_*"))) == 2

    def test_training_resume_midway(self, tmp_path):
        train, _test = make_corpus(num_train=10, num_test=2, seed=13)
        opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))
        feats = make_features({u: w for u, (w, _) in train.items()},
                              {u: u for u in train}, opts)
        lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
        tr = {u: [lang.words.id(w) for w in ws] for u, (_, ws) in train.items()}
        topts = MonoTrainOptions(num_iters=6, totgauss=100, max_iter_inc=5,
                                 realign_iters=tuple(range(1, 6)))
        # full run
        full = train_mono(feats, tr, lang, topts, out_dir=tmp_path / "full",
                          checkpoint_every=2)
        # interrupted run: stop at iteration 4 (simulated by num_iters=4)...
        part_opts = MonoTrainOptions(num_iters=4, totgauss=100, max_iter_inc=5,
                                     realign_iters=tuple(range(1, 6)))
        train_mono(feats, tr, lang, part_opts, out_dir=tmp_path / "resume",
                   checkpoint_every=2)
        # ...then resume and finish with the full schedule
        resumed = train_mono(feats, tr, lang, topts,
                             out_dir=tmp_path / "resume", checkpoint_every=2)
        # resumed model must match the uninterrupted run exactly (same
        # alignment state and deterministic updates)
        np.testing.assert_allclose(resumed.am.weights, full.am.weights,
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(resumed.am.means_invvars,
                                   full.am.means_invvars, rtol=1e-3, atol=1e-3)
