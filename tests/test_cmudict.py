"""Real-data ingestion: the reference's shipped EN lexicon (cmudict).

The reference ships `/root/reference/lexicons/EN/cmudict.dict` (135k lines)
as the PrepareDict input (`prepare_dict.cpp:51-73`); these tests feed it
through `data/dict.py read_ref_dict`/`validate_dict` and train the
joint-sequence G2P (`g2p/joint.py`, the Phonetisaurus role) on a subset,
asserting held-out pronunciations beat a conservative floor.  The full-scale
accuracy report is `CMUDICT.md` (tools/cmudict_report.py).
"""

from pathlib import Path

import pytest

from voicebridge_tpu.data.dict import prepare_dict, read_ref_dict, validate_dict
from voicebridge_tpu.g2p.joint import G2PModel

CMUDICT = Path("/root/reference/lexicons/EN/cmudict.dict")

pytestmark = pytest.mark.skipif(not CMUDICT.exists(),
                                reason="reference lexicons not present")


@pytest.fixture(scope="module")
def ref():
    return read_ref_dict(CMUDICT)


class TestParse:
    def test_full_parse(self, ref):
        # 135 010 pron lines over ~126k distinct words
        assert len(ref) > 120_000
        assert sum(len(v) for v in ref.values()) == 135_010

    def test_alternates_merged(self, ref):
        # cmudict "WORD(2)" alternates fold into one entry with variants
        assert len(ref["ABSTRACT"]) >= 2
        assert all(w.isupper() or not w.isalpha() for w in list(ref)[:100])
        assert "(" not in "".join(list(ref)[:5000])

    def test_trailing_comment_fragments_stripped(self, ref):
        # 'danglar D AH0 NG L AA1 R # foreign french'
        assert ref["DANGLAR"][0][1] == ("D", "AH0", "NG", "L", "AA1", "R")
        for _, phones in ref["DANGLAR"]:
            assert "#" not in phones

    def test_phone_set(self, ref):
        phones = {p for v in ref.values() for _, pr in v for p in pr}
        base = {p.rstrip("012") for p in phones}
        assert len(base) == 39  # ARPAbet
        assert len(phones) > len(base)  # stress digits kept by default

    def test_strip_stress(self):
        ref_ns = read_ref_dict(CMUDICT, strip_stress=True)
        phones = {p for v in ref_ns.values() for _, pr in v for p in pr}
        assert len(phones) == 39
        # duplicate prons after stripping are merged, never repeated
        for prons in list(ref_ns.values())[:2000]:
            seqs = [pr for _, pr in prons]
            assert len(seqs) == len(set(seqs))

    def test_validate_clean(self, ref):
        assert validate_dict(ref, ["SIL"]) == []


class TestG2PHeldOut:
    def test_heldout_floor(self, ref):
        """Small-subset G2P beats a conservative held-out floor (full-scale
        numbers in CMUDICT.md)."""
        words = sorted(w for w in ref if w.isalpha() and len(w) >= 3)
        held = words[5::211][:40]
        hs = set(held)
        train = {w: ref[w] for w in
                 [w for w in words if w not in hs][:1500]}
        g2p = G2PModel.train(train, order=5, align_iters=3)
        exact_ns = 0
        for w in held:
            out = g2p.pronounce(w, nbest=1)
            hyp = tuple(p.rstrip("012") for p in (out[0][0] if out else ()))
            refs = [tuple(p.rstrip("012") for p in pr) for _, pr in ref[w]]
            if any(hyp == r for r in refs):
                exact_ns += 1
        # stress-insensitive exact match; 1.5k training words gives ~20-30%
        assert exact_ns >= 4, f"only {exact_ns}/40 held-out words exact"

    def test_prepare_dict_with_cmudict(self, ref):
        """PrepareDict flow on real data: vocab partly covered by the
        reference dict, the rest G2P'd."""
        vocab = ["HELLO", "WORLD", "SPEECH", "XYLOGRAPHY", "BLORPTASTIC"]
        small_ref = {w: ref[w] for w in
                     sorted(w for w in ref if w.isalpha())[:1200]}
        for w in ("HELLO", "WORLD", "SPEECH"):
            small_ref[w] = ref[w]
        lex, g2p = prepare_dict(vocab, small_ref, ["SIL"])
        assert lex["HELLO"] == ref["HELLO"]
        assert "BLORPTASTIC" in lex  # G2P-generated, non-empty
        assert lex["BLORPTASTIC"][0][1]
        assert g2p is not None
