"""Word alignment of decoded paths (lattice-align-words[-lexicon] +
nbest-to-prons/ctm roles)."""

import numpy as np
import pytest

from voicebridge_tpu.config import LangOptions
from voicebridge_tpu.data.lang import prepare_lang
from voicebridge_tpu.lat.word_align import (align_words_boundary,
                                            align_words_lexicon, prons_rows,
                                            to_ctm)
from voicebridge_tpu.models.transition import TransitionModel
from voicebridge_tpu.steps.train_mono import make_mono_tree

LEXICON = {"YES": [(1.0, ("Y", "EH", "S"))], "NO": [(1.0, ("N", "OW"))]}


@pytest.fixture(scope="module")
def model_lang():
    lang = prepare_lang(LEXICON, ["SIL"], "SIL", LangOptions())
    tree = make_mono_tree(lang)
    return TransitionModel(lang.topo, tree), lang


def _phone_tids(model, phone, dur):
    """tids for one phone instance of ``dur`` frames: forward tid out of
    hmm-state 0 then self-loops."""
    ts = model.tuple_to_tstate(phone, 0, model.tree.map_mono(phone, 0))
    fwd = None
    for tid in range(model.state2id[ts], model.state2id[ts + 1]):
        if not model.tid_is_self_loop[tid]:
            fwd = tid
            break
    assert fwd is not None
    self_loop = model.self_loop_tid_of(ts)
    return [fwd] + [self_loop] * (dur - 1)


def _make_ali(model, lang, spec):
    """spec: list of (phone name incl. positional suffix, frames)."""
    tids = []
    for name, dur in spec:
        tids.extend(_phone_tids(model, lang.phones.id(name), dur))
    return tids


SPEC = [("SIL", 3), ("Y_B", 2), ("EH_I", 4), ("S_E", 1),
        ("SIL", 2), ("N_B", 3), ("OW_E", 2), ("SIL", 1)]


class TestWordAlign:
    def test_lexicon_alignment_exact_times(self, model_lang):
        model, lang = model_lang
        tids = _make_ali(model, lang, SPEC)
        segs = align_words_lexicon(tids, ["YES", "NO"], model, lang, LEXICON)
        assert segs is not None
        words = [(s.word, s.begin_frame, s.num_frames) for s in segs]
        assert words == [(None, 0, 3), ("YES", 3, 7), (None, 10, 2),
                         ("NO", 12, 5), (None, 17, 1)]
        yes = segs[1]
        assert yes.pron == ("Y", "EH", "S")
        assert yes.phone_durations == (2, 4, 1)

    def test_boundary_alignment_matches_lexicon(self, model_lang):
        model, lang = model_lang
        tids = _make_ali(model, lang, SPEC)
        a = align_words_lexicon(tids, ["YES", "NO"], model, lang, LEXICON)
        b = align_words_boundary(tids, ["YES", "NO"], model, lang)
        assert [(s.word, s.begin_frame, s.num_frames, s.pron) for s in a] == \
               [(s.word, s.begin_frame, s.num_frames, s.pron) for s in b]

    def test_boundary_alignment_failure(self, model_lang):
        model, lang = model_lang
        tids = _make_ali(model, lang, SPEC)
        # wrong word count -> failure, like the reference's error lattices
        assert align_words_boundary(tids, ["YES"], model, lang) is None
        # orphan word-internal phone -> failure
        bad = _make_ali(model, lang, [("EH_I", 2)])
        assert align_words_boundary(bad, [], model, lang) is None

    def test_ctm_and_prons_rows(self, model_lang):
        model, lang = model_lang
        tids = _make_ali(model, lang, SPEC)
        segs = align_words_lexicon(tids, ["YES", "NO"], model, lang, LEXICON)
        ctm = to_ctm(segs, "utt1", frame_shift=0.01)
        assert ctm == ["utt1 1 0.03 0.07 YES", "utt1 1 0.12 0.05 NO"]
        rows = prons_rows(segs, "utt1")
        assert rows == ["utt1 3 7 YES Y EH S", "utt1 12 5 NO N OW"]

    def test_durations_cover_all_frames(self, model_lang):
        model, lang = model_lang
        tids = _make_ali(model, lang, SPEC)
        segs = align_words_lexicon(tids, ["YES", "NO"], model, lang, LEXICON)
        assert sum(s.num_frames for s in segs) == len(tids)
