"""topsort / randgen / replace (fst/misc.py) unit tests."""

import numpy as np

from voicebridge_tpu.fst import Fst, ZERO, randgen, replace, topsort
from voicebridge_tpu.fst.core import EPS
from voicebridge_tpu.fst.shortest import shortest_distance


def linear_fst(labels, weight=0.5):
    f = Fst()
    s = f.add_state()
    f.set_start(s)
    for lab in labels:
        n = f.add_state()
        f.add_arc(s, lab, lab, weight, n)
        s = n
    f.set_final(s, 0.0)
    return f


def test_topsort_acyclic():
    f = Fst()
    ids = [f.add_state() for _ in range(4)]
    f.set_start(ids[2])
    # 2 -> 0 -> 3 -> 1 (deliberately out of order)
    f.add_arc(ids[2], 1, 1, 0.1, ids[0])
    f.add_arc(ids[0], 2, 2, 0.2, ids[3])
    f.add_arc(ids[3], 3, 3, 0.3, ids[1])
    f.set_final(ids[1], 0.0)
    assert topsort(f)
    assert f.start == 0
    for s in f.states():
        for a in f.arcs[s]:
            assert a.nextstate > s  # topological property


def test_topsort_cyclic_returns_false():
    f = Fst()
    a, b = f.add_state(), f.add_state()
    f.set_start(a)
    f.add_arc(a, 1, 1, 0.0, b)
    f.add_arc(b, 2, 2, 0.0, a)
    f.set_final(b, 0.0)
    arcs_before = [(s, len(f.arcs[s])) for s in f.states()]
    assert not topsort(f)
    assert [(s, len(f.arcs[s])) for s in f.states()] == arcs_before


def test_randgen_weighted_paths_are_valid():
    f = Fst()
    s0, s1, s2 = f.add_state(), f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, 1, 1, 0.1, s1)
    f.add_arc(s0, 2, 2, 3.0, s2)  # much heavier -> rarely sampled
    f.set_final(s1, 0.0)
    f.set_final(s2, 0.0)
    out = randgen(f, npath=40, seed=3)
    # every generated path must reach a final state
    assert out.start != -1
    labels = []
    for s in out.states():
        for a in out.arcs[s]:
            labels.append(a.ilabel)
    assert set(labels) <= {1, 2}
    # weighted sampling must prefer the cheap arc
    assert labels.count(1) > labels.count(2)


def test_randgen_all_infinite_drops_path():
    f = Fst()
    s0, s1 = f.add_state(), f.add_state()
    f.set_start(s0)
    f.add_arc(s0, 1, 1, ZERO, s1)  # infinite-cost arc, s0 not final
    out = randgen(f, npath=3, seed=0)
    assert out.num_states <= 1  # no successful path sampled


def test_replace_expands_nonterminal_with_epsilon():
    nonterm = 100
    root = Fst()
    a, b, c = root.add_state(), root.add_state(), root.add_state()
    root.set_start(a)
    root.add_arc(a, 7, 7, 0.25, b)
    root.add_arc(b, nonterm, nonterm, 0.5, c)
    root.set_final(c, 0.0)
    sub = linear_fst([8, 9], weight=0.125)
    out = replace(root, {nonterm: sub})
    # the nonterminal label must not survive on either tape
    for s in out.states():
        for arc in out.arcs[s]:
            assert arc.ilabel != nonterm
            assert arc.olabel != nonterm
    # total path cost preserved: 0.25 + 0.5 + 2*0.125 = 1.0
    dist = shortest_distance(out)
    finals = [dist[s] + out.finals[s] for s in out.states()
              if out.finals[s] != ZERO]
    assert np.isclose(min(finals), 1.0)
    # input side of the call arc is epsilon (REPLACE_LABEL_NEITHER)
    ilabels = [a2.ilabel for s in out.states() for a2 in out.arcs[s]]
    assert EPS in ilabels or 8 in ilabels


def test_replace_nested():
    nt1, nt2 = 100, 101
    root = linear_fst([nt1])
    mid = linear_fst([5, nt2])
    leaf = linear_fst([6])
    out = replace(root, {nt1: mid, nt2: leaf})
    olabels = set()
    for s in out.states():
        for a in out.arcs[s]:
            olabels.add(a.olabel)
    assert 5 in olabels and 6 in olabels
    assert nt1 not in olabels and nt2 not in olabels
