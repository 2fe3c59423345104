"""Unit tests in the reference's L1-L3 style (SURVEY.md §4): GMM likelihood
kernel vs naive numpy (diag-gmm-test role), transition-model invariants
(hmm-utils-test role), archive round trips (kaldi-table-test role)."""

import math

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from voicebridge_tpu.config import LangOptions
from voicebridge_tpu.data.lang import prepare_lang
from voicebridge_tpu.models.gmm import AmDiagGmm
from voicebridge_tpu.models.transition import TransitionModel
from voicebridge_tpu.ops import gmm_kernels as K
from voicebridge_tpu.steps.train_mono import make_mono_tree
from voicebridge_tpu.utils.io import ArrayArchive, ArrayArchiveWriter

RNG = np.random.default_rng(42)


def random_am(p=7, m=3, d=11):
    means = RNG.standard_normal((p, m, d)) * 2
    var = 0.3 + RNG.random((p, m, d))
    w = RNG.random((p, m)) + 0.1
    w /= w.sum(axis=1, keepdims=True)
    return AmDiagGmm((means / var).astype(np.float32),
                     (1 / var).astype(np.float32), w.astype(np.float32))


class TestGmmKernel:
    def test_loglikes_match_naive(self):
        am = random_am()
        x = RNG.standard_normal((20, am.dim)).astype(np.float32)
        got = np.asarray(K.loglikes(K.pack_gmm(am), jnp.asarray(x)))
        for n in range(20):
            for p in range(am.num_pdfs):
                want = am.loglike(p, x[n].astype(np.float64))
                assert abs(got[n, p] - want) < 2e-3, (n, p)

    def test_gconst_formula(self):
        # direct check of the diag-gmm.cc:121-129 formula
        am = random_am(p=1, m=1, d=3)
        mean = am.means()[0, 0].astype(np.float64)
        var = am.variances()[0, 0].astype(np.float64)
        w = float(am.weights[0, 0])
        want = (math.log(w) - 0.5 * (3 * math.log(2 * math.pi)
                                     + np.log(var).sum()
                                     + (mean ** 2 / var).sum()))
        assert abs(float(am.gconsts[0, 0]) - want) < 1e-4

    def test_em_increases_likelihood(self):
        am = random_am(p=3, m=2, d=5)
        # data from a DIFFERENT model: EM steps must increase aligned loglike
        target = random_am(p=3, m=2, d=5)
        x = np.concatenate([
            target.means()[p, 0] + 0.5 * RNG.standard_normal((50, 5))
            for p in range(3)]).astype(np.float32)
        pdfs = np.repeat(np.arange(3), 50).astype(np.int32)
        lls = []
        for _ in range(4):
            params = K.pack_gmm(am)
            lls.append(float(K.aligned_loglike(params, jnp.asarray(x),
                                               jnp.asarray(pdfs))))
            occ, macc, vacc = K.acc_gmm_stats(params, jnp.asarray(x),
                                              jnp.asarray(pdfs), 3,
                                              jnp.ones(len(x), np.float32))
            am.mle_update(np.asarray(occ), np.asarray(macc), np.asarray(vacc),
                          min_gaussian_occupancy=1.0)
        assert lls[-1] > lls[0] + 1.0
        assert all(lls[i + 1] >= lls[i] - 1e-3 for i in range(len(lls) - 1))

    def test_split_preserves_density_shape(self):
        am = random_am(p=2, m=1, d=4)
        x = RNG.standard_normal(4).astype(np.float64)
        before = [am.loglike(p, x) for p in range(2)]
        occ = np.ones((2, 1), np.float32) * 100
        am.split_to_target(6, occ, perturb_factor=0.0)
        after = [am.loglike(p, x) for p in range(2)]
        # zero perturbation split: density unchanged
        np.testing.assert_allclose(after, before, atol=1e-3)
        assert am.num_gauss == 6


class TestTransitionModel:
    @pytest.fixture(scope="class")
    def tm(self):
        lang = prepare_lang({"YES": [(1.0, ("Y",))], "NO": [(1.0, ("N",))]},
                            ["SIL"], "SIL", LangOptions())
        tree = make_mono_tree(lang)
        return TransitionModel(lang.topo, tree), lang

    def test_tid_roundtrip(self, tm):
        model, _ = tm
        for tid in range(1, model.num_transition_ids + 1):
            phone, state, pdf, idx = model.tid_info(tid)
            ts = model.tuple_to_tstate(phone, state, pdf)
            assert model.pair_to_tid(ts, idx) == tid
            assert model.tid2pdf[tid] == pdf
            assert model.tid2phone[tid] == phone

    def test_probs_normalized(self, tm):
        model, _ = tm
        for ts in range(1, len(model.tuples) + 1):
            lo, hi = model.state2id[ts], model.state2id[ts + 1]
            total = np.exp(model.log_probs[lo:hi]).sum()
            assert abs(total - 1.0) < 1e-4

    def test_mle_update_moves_to_counts(self, tm):
        model, _ = tm
        counts = np.zeros(model.num_transition_ids + 1)
        ts = 1
        lo, hi = model.state2id[ts], model.state2id[ts + 1]
        counts[lo] = 90
        counts[lo + 1: hi] = 10 / max(hi - lo - 1, 1)
        impr = model.mle_update(counts)
        assert impr >= 0
        assert abs(math.exp(model.log_probs[lo]) - 0.9) < 0.02

    def test_split_to_phones_silence(self, tm):
        model, lang = tm
        # construct alignment: SIL(3 frames) Y(2) via tids
        sil = lang.silence_phone_ids[0]
        y = lang.phones.id("Y_S")
        sil_ts = model.tuple_to_tstate(sil, 0, model.tree.map_mono(sil, 0))
        y_ts = model.tuple_to_tstate(y, 0, model.tree.map_mono(y, 0))
        def fwd_tid(ts):
            # first NON-self-loop transition out of the state — always exists
            # (every emitting HMM state has a forward arc in these topos)
            lo, hi = model.state2id[ts], model.state2id[ts + 1]
            for tid in range(lo, hi):
                if not model.tid_is_self_loop[tid]:
                    return tid
            raise AssertionError(f"tstate {ts} has only self-loops")

        sil_fwd = fwd_tid(sil_ts)
        y_fwd = fwd_tid(y_ts)
        sil_self = model.self_loop_tid_of(sil_ts)
        y_self = model.self_loop_tid_of(y_ts)
        ali = [sil_fwd, sil_self, sil_self, y_fwd, y_self]
        phones, seg = model.split_to_phones(ali)
        assert phones == [sil, y]
        assert list(seg) == [0, 0, 0, 1, 1]


class TestArchive:
    def test_roundtrip_and_mmap(self, tmp_path):
        w = ArrayArchiveWriter(tmp_path / "a", dtype=np.float32)
        data = {f"utt{i}": RNG.standard_normal((i + 1, 4)).astype(np.float32)
                for i in range(5)}
        for k, v in sorted(data.items()):
            w.write(k, v)
        arc = w.close()
        back = ArrayArchive(tmp_path / "a")
        assert set(back.keys()) == set(data)
        for k, v in data.items():
            np.testing.assert_array_equal(back[k], v)
            assert back.num_rows(k) == v.shape[0]

    def test_uint8_compression_roundtrip(self, tmp_path):
        """CompressedMatrix role (matrix/compressed-matrix.h): lossy uint8
        storage; error bounded by half a quantization step per column."""
        w = ArrayArchiveWriter(tmp_path / "c", dtype=np.float32,
                               compression="uint8")
        data = {f"utt{i}": (RNG.standard_normal((30, 13)) * (i + 1)
                            ).astype(np.float32) for i in range(4)}
        for k, v in sorted(data.items()):
            w.write(k, v)
        w.close()
        back = ArrayArchive(tmp_path / "c")
        assert back.compression == "uint8"
        raw = np.load(tmp_path / "c" / "data.npy")
        assert raw.dtype == np.uint8
        for k, v in data.items():
            step = (v.max(axis=0) - v.min(axis=0)) / 255.0
            err = np.abs(back[k] - v)
            assert (err <= step / 2 + 1e-6).all()

    def test_duplicate_key_rejected(self, tmp_path):
        w = ArrayArchiveWriter(tmp_path / "b")
        w.write("x", np.zeros((2, 2)))
        with pytest.raises(KeyError):
            w.write("x", np.zeros((2, 2)))


class TestArpaRoundtrip:
    def test_write_read(self, tmp_path):
        from voicebridge_tpu.lm.arpa import ArpaModel
        from voicebridge_tpu.lm.ngram import estimate_ngram

        sents = [["A", "B"], ["A", "C"], ["B", "A"], ["A", "B", "C"]]
        arpa = estimate_ngram(sents, order=3)
        arpa.write(tmp_path / "m.arpa")
        back = ArpaModel.read(tmp_path / "m.arpa")
        for s in sents:
            assert abs(arpa.score_sentence(s) - back.score_sentence(s)) < 1e-4

    def test_probabilities_normalized(self):
        from voicebridge_tpu.lm.ngram import estimate_ngram

        sents = [["A", "B"], ["B", "A"], ["A", "A"], ["B", "B"], ["A"]]
        arpa = estimate_ngram(sents, order=2)
        # sum over vocab of p(w | <s>) must be ~1
        vocab = ["A", "B", "</s>"]
        total = sum(10 ** arpa._score_word(("<s>",), w) for w in vocab)
        assert abs(total - 1.0) < 0.02, total
        total_u = sum(10 ** arpa._score_word((), w) for w in vocab)
        assert abs(total_u - 1.0) < 0.02, total_u


class TestFullGmm:
    """FullGmm (gmm/full-gmm.h:40, mle-full-gmm.h roles)."""

    def _full(self, p=3, m=2, d=4, seed=5):
        from voicebridge_tpu.models.full_gmm import FullGmm

        rng = np.random.default_rng(seed)
        w = rng.random((p, m)) + 0.2
        w /= w.sum(axis=1, keepdims=True)
        mu = rng.standard_normal((p, m, d)) * 2
        ic = np.zeros((p, m, d, d))
        for i in range(p):
            for j in range(m):
                a = rng.standard_normal((d, d)) * 0.3
                cov = a @ a.T + np.eye(d)
                ic[i, j] = np.linalg.inv(cov)
        return FullGmm(w, mu, ic)

    def test_loglik_matches_scipy_formula(self):
        from voicebridge_tpu.models.full_gmm import (loglikes_full,
                                                     pack_full_gmm)

        g = self._full()
        x = RNG.standard_normal((12, g.dim)).astype(np.float32)
        dev = np.asarray(loglikes_full(pack_full_gmm(g), jnp.asarray(x)))
        for n in range(12):
            # oracle: sum of weighted full-cov normal densities
            for p in range(g.num_pdfs):
                dens = 0.0
                for j in range(g.max_mix):
                    diff = x[n] - g.means[p, j]
                    ic = g.inv_covars[p, j]
                    _s, logdet = np.linalg.slogdet(ic)
                    lg = (np.log(g.weights[p, j]) + 0.5 * logdet
                          - 0.5 * g.dim * np.log(2 * np.pi)
                          - 0.5 * diff @ ic @ diff)
                    dens += np.exp(lg)
                assert abs(dev[n, p] - np.log(dens)) < 1e-3

    def test_em_monotone_and_recovers(self):
        from voicebridge_tpu.models.full_gmm import (FullGmm, acc_full_stats,
                                                     loglikes_full,
                                                     pack_full_gmm)

        rng = np.random.default_rng(3)
        d = 3
        # true single-pdf 2-mix full-cov data
        a1 = rng.standard_normal((d, d)) * 0.4 + np.eye(d)
        cov1 = a1 @ a1.T
        x = np.concatenate([
            rng.multivariate_normal([2, 0, -1], cov1, 400),
            rng.multivariate_normal([-2, 1, 1], np.eye(d) * 0.5, 400),
        ]).astype(np.float32)
        pdf_ids = jnp.zeros(len(x), jnp.int32)
        # init: 2 mixes at data mean +- jitter, identity precision
        mu0 = x.mean(axis=0)
        g = FullGmm(np.array([[0.5, 0.5]]),
                    np.stack([[mu0 + 0.1, mu0 - 0.1]]),
                    np.broadcast_to(np.eye(d), (1, 2, d, d)).copy())
        lls = []
        for _ in range(8):
            packed = pack_full_gmm(g)
            lls.append(float(loglikes_full(packed, jnp.asarray(x)).sum()))
            occ, xa, xxa = acc_full_stats(packed, jnp.asarray(x), pdf_ids, 1)
            g.mle_update(np.asarray(occ, np.float64),
                         np.asarray(xa, np.float64),
                         np.asarray(xxa, np.float64))
        assert all(b >= a - 1e-2 for a, b in zip(lls, lls[1:])), lls
        assert lls[-1] > lls[0] + 100  # real improvement

    def test_diag_roundtrip(self):
        from voicebridge_tpu.models.full_gmm import FullGmm

        am = random_am(p=4, m=2, d=5)
        full = FullGmm.from_diag(am)
        x = RNG.standard_normal(5).astype(np.float64)
        for p in range(4):
            assert abs(full.loglike(p, x) - am.loglike(p, x)) < 1e-3
        back = full.to_diag()
        np.testing.assert_allclose(back.inv_vars, am.inv_vars, rtol=1e-5)

    def test_save_load(self, tmp_path):
        from voicebridge_tpu.models.full_gmm import FullGmm

        g = self._full()
        g.save(tmp_path / "full.npz")
        g2 = FullGmm.load(tmp_path / "full.npz")
        np.testing.assert_allclose(g2.gconsts, g.gconsts)
