"""Tests for data preparation (PrepareData role) and G2P (Phonetisaurus role)."""

import numpy as np
import pytest

from voicebridge_tpu.data.dict import prepare_dict, read_ref_dict
from voicebridge_tpu.data.prepare import (DataDir, prepare_data, scan_wav_dir,
                                          split_train_test)
from voicebridge_tpu.g2p.joint import G2PModel, M2MAligner
from voicebridge_tpu.utils.wave import write_wave

# a small phonetically-regular dictionary for G2P training
REF_DICT = {
    "CAT": [(1.0, ("K", "AE", "T"))],
    "BAT": [(1.0, ("B", "AE", "T"))],
    "HAT": [(1.0, ("HH", "AE", "T"))],
    "MAT": [(1.0, ("M", "AE", "T"))],
    "CAN": [(1.0, ("K", "AE", "N"))],
    "BAN": [(1.0, ("B", "AE", "N"))],
    "MAN": [(1.0, ("M", "AE", "N"))],
    "HAND": [(1.0, ("HH", "AE", "N", "D"))],
    "BAND": [(1.0, ("B", "AE", "N", "D"))],
    "SAT": [(1.0, ("S", "AE", "T"))],
    "SAND": [(1.0, ("S", "AE", "N", "D"))],
    "TAN": [(1.0, ("T", "AE", "N"))],
    "COT": [(1.0, ("K", "AA", "T"))],
    "DOT": [(1.0, ("D", "AA", "T"))],
    "HOT": [(1.0, ("HH", "AA", "T"))],
    "NOT": [(1.0, ("N", "AA", "T"))],
    "TOT": [(1.0, ("T", "AA", "T"))],
    "DAN": [(1.0, ("D", "AE", "N"))],
}


class TestG2P:
    def test_aligner_monotone(self):
        a = M2MAligner()
        pairs = [(tuple(w), tuple(p[0][1])) for w, p in REF_DICT.items()]
        a.train(pairs, num_iters=5)
        ali = a.best_alignment(tuple("CAT"), ("K", "AE", "T"))
        assert ali is not None
        gs = [g for g, _p in ali]
        assert tuple("".join("".join(g) for g in gs)) == tuple("CAT")

    def test_pronounce_seen_words(self):
        model = G2PModel.train(REF_DICT, order=4)
        hits = 0
        for word, prons in REF_DICT.items():
            out = model.pronounce(word)
            if out and tuple(out[0][0]) == tuple(prons[0][1]):
                hits += 1
        assert hits >= len(REF_DICT) * 0.8, f"only {hits}/{len(REF_DICT)}"

    def test_pronounce_novel_word(self):
        model = G2PModel.train(REF_DICT, order=4)
        # "CAND" unseen: plausible pron K AE N D
        out = model.pronounce("CAND")
        assert out and out[0][0], "no pronunciation produced"
        phones = tuple(out[0][0])
        assert phones[0] == "K"
        assert "AE" in phones or "AA" in phones

    def test_save_load_roundtrip(self, tmp_path):
        model = G2PModel.train(REF_DICT, order=3)
        model.save(tmp_path / "g2p")
        back = G2PModel.load(tmp_path / "g2p")
        w = "BAT"
        assert [p for p, _c in model.pronounce(w)] == \
            [p for p, _c in back.pronounce(w)]

    def test_prepare_dict_with_g2p(self):
        vocab = ["CAT", "HOT", "CAND", "BAT"]
        lex, g2p = prepare_dict(vocab, REF_DICT, ["SIL"])
        assert set(v for v in vocab) <= set(lex)
        assert lex["CAT"] == REF_DICT["CAT"]
        assert g2p is not None  # trained for CAND
        assert lex["CAND"][0][1]  # non-empty pron
        assert "<UNK>" in lex


class TestPrepareData:
    def _make_dataset(self, root, n_per_spk=3, speakers=("alice", "bob", "carol", "dave")):
        rng = np.random.default_rng(0)
        words = ["CAT", "HOT", "BAT"]
        for spk in speakers:
            d = root / spk
            d.mkdir(parents=True)
            for i in range(n_per_spk):
                wav = d / f"{spk}_{i:02d}.wav"
                write_wave(wav, 8000, rng.standard_normal(4000) * 100)
                k = int(rng.integers(1, 4))
                text = " ".join(rng.choice(words) for _ in range(k))
                wav.with_suffix(".txt").write_text(text)

    def test_scan_and_split(self, tmp_path):
        self._make_dataset(tmp_path)
        data = scan_wav_dir(tmp_path, ".txt", idtype=0)
        assert len(data.utts) == 12
        assert set(data.utt2spk.values()) == {"alice", "bob", "carol", "dave"}
        assert not data.validate()
        train, test = split_train_test(data, 75)
        assert len(train.utts) + len(test.utts) == 12
        assert len(train.utts) >= 6
        # speaker-coherent split: no speaker straddles both sets
        tr_spk = {data.utt2spk[u] for u in train.utts}
        te_spk = {data.utt2spk[u] for u in test.utts}
        assert not (tr_spk & te_spk)

    def test_prepare_data_full(self, tmp_path):
        self._make_dataset(tmp_path / "waves")
        out = tmp_path / "data"
        train, test, arpa, vocab = prepare_data(
            tmp_path / "waves", percentage_train=75, idtype=0, out_dir=out)
        assert (out / "train" / "wav.scp").exists()
        assert (out / "task.arpabo").exists()
        assert set(vocab) <= {"CAT", "HOT", "BAT"}
        # LM assigns finite prob to seen sentences
        lp = arpa.score_sentence(train.text[train.utts[0]])
        assert lp > -50

    def test_idtype_filename_prefix(self, tmp_path):
        d = tmp_path / "w"
        d.mkdir()
        write_wave(d / "spk1_utt.wav", 8000, np.zeros(2000))
        (d / "spk1_utt.txt").write_text("CAT")
        data = scan_wav_dir(d, ".txt", idtype=4)
        assert data.utt2spk["spk1_utt"] == "spk1"
