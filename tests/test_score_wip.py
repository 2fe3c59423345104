"""Word-insertion-penalty sweep: WIP must actually change the chosen
hypothesis (reference grid: score_kaldi_wer.cpp:93-111, LMWT 7..17 x WIP
{0.0, 0.5, 1.0} -> BestWer)."""

import numpy as np

from voicebridge_tpu.lat import lattice_best_path
from voicebridge_tpu.lat.lattice import Lattice
from voicebridge_tpu.ops.viterbi import NEG_INF, DenseGraph
from voicebridge_tpu.steps.score import score_sweep


def two_path_lattice():
    """Frame-synchronous 2-frame lattice with two complete paths:

    A: 0 -(w1)-> 1 -(w2)-> 3   two words, cheaper acoustics
    B: 0 -(w3)-> 2 -( . )-> 3  one word, slightly worse acoustics
    """
    oseqs = [(), (11,), (12,), (13,)]
    arc_src = np.array([0, 1, 0, 2], np.int32)
    arc_dst = np.array([1, 3, 2, 3], np.int32)
    arc_score = np.array([0.0, 0.0, 0.0, 0.0], np.float32)  # graph cost 0
    arc_oseq = np.array([1, 2, 3, 0], np.int32)
    g = DenseGraph(
        num_states=4, arc_src=arc_src, arc_dst=arc_dst,
        arc_tid=np.array([1, 2, 3, 4], np.int32),
        arc_pdf=np.zeros(4, np.int32), arc_score=arc_score,
        arc_oseq=arc_oseq,
        alpha0=np.array([0.0, NEG_INF, NEG_INF, NEG_INF], np.float32),
        start_oseq=np.zeros(4, np.int32),
        final_score=np.array([NEG_INF, NEG_INF, NEG_INF, 0.0], np.float32),
        final_oseq=np.zeros(4, np.int32), oseqs=oseqs)
    # acoustic costs: path A total 1.0, path B total 1.2
    lat = Lattice(graph=g, nf=2,
                  arc_t=np.array([0, 0, 1, 1], np.int32),
                  arc_id=np.array([0, 2, 1, 3], np.int32),
                  acoustic_cost=np.array([0.5, 0.6, 0.5, 0.6], np.float32),
                  use_final=True)
    return lat


def test_wip_changes_best_path():
    lat = two_path_lattice()
    p0 = lattice_best_path(lat, lm_scale=1.0, acoustic_scale=1.0,
                           word_penalty=0.0)
    assert p0["words"] == [11, 12]  # two-word path wins without penalty
    p1 = lattice_best_path(lat, lm_scale=1.0, acoustic_scale=1.0,
                           word_penalty=0.5)
    assert p1["words"] == [13]  # penalty of 0.5/word flips to one-word path


def test_score_sweep_grid_and_best_wip():
    refs = {"u1": ["c"]}
    hyps_by_point = {
        (7, 0.0): {"u1": ["a", "b"]},   # 2 errors
        (7, 0.5): {"u1": ["c"]},        # exact
        (7, 1.0): {"u1": []},           # 1 deletion
        (8, 0.0): {"u1": ["a"]},        # 1 sub
    }
    res = score_sweep(refs, hyps_by_point)
    assert set(res.table) == {(7, 0.0), (7, 0.5), (7, 1.0), (8, 0.0)}
    assert (res.best_lmwt, res.best_wip) == (7, 0.5)
    assert res.best_wer.num_err == 0


def test_score_sweep_plain_lmwt_keys_still_work():
    refs = {"u1": ["a"]}
    res = score_sweep(refs, {7: {"u1": ["a"]}, 9: {"u1": ["b"]}})
    assert res.best_lmwt == 7 and res.best_wip == 0.0
