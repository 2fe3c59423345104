"""Fault-injection tests (SURVEY §5.3 — failure detection / recovery).

The reference has NO fault injection (COMPONENTS.md / VERDICT round 1 marked
this subsystem partial); its error model is return codes + re-run recovery.
These tests inject the real failure classes and assert the framework's
behavior: skip-and-log for per-utterance faults, loud abort for systemic
faults and numerical divergence, and checkpoint recovery from a hard kill
(SIGKILL mid-training — the single-host preemption/elastic story).
"""

import os
import signal
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import numpy as np
import pytest

from voicebridge_tpu.config import (FrameOptions, LangOptions, MfccOptions,
                                    MonoTrainOptions)
from voicebridge_tpu.data.lang import prepare_lang
from voicebridge_tpu.data.prepare import DataDir, load_waves
from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.steps.make_feats import make_features
from voicebridge_tpu.steps.train_mono import train_mono
from voicebridge_tpu.utils.health import (FailureTracker, NumericalDivergence,
                                          TooManyFailures, check_finite)
from voicebridge_tpu.utils.wave import write_wave

from synth import LEXICON, SR, make_corpus


class TestHealthPrimitives:
    def test_check_finite_passes_sentinel(self):
        check_finite("x", a=np.array([1.0, -1.0e30]))  # -inf sentinel ok

    def test_check_finite_raises_on_nan(self):
        with pytest.raises(NumericalDivergence, match="'bad' at"):
            check_finite("stage", ok=np.ones(3),
                         bad=np.array([[1.0, np.nan], [0.0, 0.0]]))

    def test_check_finite_raises_on_posinf(self):
        with pytest.raises(NumericalDivergence):
            check_finite("stage", a=np.array([np.inf]))

    def test_tracker_tolerates_minority(self):
        t = FailureTracker("s", total=10)
        for i in range(3):
            t.record(f"u{i}", "reason")
        t.finish(max_fail_frac=0.5)  # no raise
        assert t.num_failed == 3

    def test_tracker_aborts_on_systemic_failure(self):
        t = FailureTracker("s", total=4)
        for i in range(3):
            t.record(f"u{i}", "boom")
        with pytest.raises(TooManyFailures, match="3/4"):
            t.finish(max_fail_frac=0.5)


class TestCorruptWav:
    def _data(self, tmp_path, n_good: int, n_bad: int) -> DataDir:
        d = DataDir()
        rng = np.random.default_rng(0)
        for i in range(n_good):
            p = tmp_path / f"good{i}.wav"
            write_wave(p, 8000, rng.standard_normal(4000).astype(np.float32))
            d.wav_paths[f"good{i}"] = p
            d.text[f"good{i}"] = ["YES"]
            d.utt2spk[f"good{i}"] = "s"
        for i in range(n_bad):
            p = tmp_path / f"bad{i}.wav"
            p.write_bytes(b"RIFF\x00\x01garbage-not-a-wav")
            d.wav_paths[f"bad{i}"] = p
            d.text[f"bad{i}"] = ["NO"]
            d.utt2spk[f"bad{i}"] = "s"
        return d

    def test_minority_corrupt_files_skipped(self, tmp_path):
        d = self._data(tmp_path, n_good=9, n_bad=1)
        waves = load_waves(d)
        assert len(waves) == 9
        assert all(k.startswith("good") for k in waves)

    def test_majority_corrupt_aborts(self, tmp_path):
        d = self._data(tmp_path, n_good=2, n_bad=8)
        with pytest.raises(TooManyFailures):
            load_waves(d)


class TestDivergenceDetection:
    def test_nan_features_abort_training(self, tmp_path):
        train, _ = make_corpus(num_train=6, num_test=1, seed=3)
        opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))
        feats = make_features({u: w for u, (w, _) in train.items()},
                              {u: u for u in train}, opts)
        # inject NaN into one utterance's features (a corrupt upstream stage)
        k = sorted(feats)[0]
        feats[k] = feats[k].copy()
        feats[k][5, :] = np.nan
        lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
        tr = {u: [lang.words.id(w) for w in ws]
              for u, (_, ws) in train.items()}
        with pytest.raises(NumericalDivergence):
            train_mono(feats, tr, lang,
                       MonoTrainOptions(num_iters=2, totgauss=50,
                                        max_iter_inc=1,
                                        realign_iters=(1,)))

    def test_mle_update_rejects_inf_stats(self):
        rng = np.random.default_rng(0)
        am = AmDiagGmm.flat_start(3, rng.standard_normal(4), np.ones(4))
        occ = np.ones((3, 1))
        macc = np.zeros((3, 1, 4))
        vacc = np.ones((3, 1, 4))
        vacc[1, 0, 2] = np.inf
        with pytest.raises(NumericalDivergence, match="var_acc"):
            am.mle_update(occ, macc, vacc)


class TestPreemptionRecovery:
    """SIGKILL mid-training, then resume from the checkpoint: the final model
    must match an uninterrupted run (single-host elastic recovery)."""

    _SCRIPT = textwrap.dedent("""
        import jax
        jax.config.update("jax_platforms", "cpu")  # sitecustomize ignores env
        import os
        import signal
        import sys
        sys.path.insert(0, {repo!r})
        sys.path.insert(0, {tests!r})
        import numpy as np
        from voicebridge_tpu.config import (FrameOptions, LangOptions,
                                            MfccOptions, MonoTrainOptions)
        from voicebridge_tpu.data.lang import prepare_lang
        from voicebridge_tpu.steps.make_feats import make_features
        from voicebridge_tpu.steps.train_mono import train_mono
        from voicebridge_tpu.utils import checkpoint as CK
        from synth import LEXICON, SR, make_corpus

        kill_after = int(os.environ.get("VB_KILL_AFTER_CKPTS", "0"))
        if kill_after:
            # hard-kill the process right after the Nth checkpoint lands —
            # a deterministic preemption mid-training
            orig = CK.TrainCheckpoint.save
            count = [0]
            def save_then_die(self, *a, **kw):
                orig(self, *a, **kw)
                count[0] += 1
                if count[0] >= kill_after:
                    os.kill(os.getpid(), signal.SIGKILL)
            CK.TrainCheckpoint.save = save_then_die

        train, _ = make_corpus(num_train=8, num_test=1, seed=11)
        opts = MfccOptions(frame_opts=FrameOptions(samp_freq=SR, dither=0.0))
        feats = make_features({{u: w for u, (w, _) in train.items()}},
                              {{u: u for u in train}}, opts)
        lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
        tr = {{u: [lang.words.id(w) for w in ws]
              for u, (_, ws) in train.items()}}
        topts = MonoTrainOptions(num_iters=6, totgauss=80, max_iter_inc=5,
                                 realign_iters=tuple(range(1, 6)))
        m = train_mono(feats, tr, lang, topts, out_dir={out!r},
                       checkpoint_every=1)
        np.save({out!r} + "/done_weights.npy", m.am.weights)
        print("DONE", flush=True)
    """)

    def _run(self, repo, tests, out, kill_after_ckpts: int | None):
        script = self._SCRIPT.format(repo=str(repo), tests=str(tests),
                                     out=str(out))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        if kill_after_ckpts:
            env["VB_KILL_AFTER_CKPTS"] = str(kill_after_ckpts)
        proc = subprocess.Popen([sys.executable, "-c", script], env=env,
                                stdout=subprocess.PIPE, text=True)
        proc.wait(timeout=600)
        if kill_after_ckpts is None:
            assert proc.returncode == 0
        else:
            assert proc.returncode == -signal.SIGKILL
            assert len(list((Path(out) / "checkpoints").glob("iter_*"))) \
                >= 1, "no checkpoint survived the kill"

    def test_sigkill_then_resume_matches_uninterrupted(self, tmp_path):
        repo = Path(__file__).resolve().parent.parent
        tests = repo / "tests"
        full, inter = tmp_path / "full", tmp_path / "inter"
        full.mkdir(), inter.mkdir()
        self._run(repo, tests, full, kill_after_ckpts=None)
        self._run(repo, tests, inter, kill_after_ckpts=2)  # hard kill
        assert not (inter / "done_weights.npy").exists()
        self._run(repo, tests, inter, kill_after_ckpts=None)  # resume
        w_full = np.load(full / "done_weights.npy")
        w_res = np.load(inter / "done_weights.npy")
        np.testing.assert_allclose(w_res, w_full, rtol=1e-4, atol=1e-5)
