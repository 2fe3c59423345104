"""Lexicon FSTs: L and L_disambig.

Counterparts: ``make_lexicon_fst.cpp`` (:29-220), ``add_lex_disambig.cpp``
(:1-241) and ``fstaddselfloops`` from the reference's prepare_lang pipeline
(§3.4).  Structure (sil_prob > 0):

    start(0) --eps/eps:nosilcost--> loop(1)        [loop is final]
    start(0) --eps/eps:silcost--> sil(2)
    sil(2)   --SIL/eps--> loop                      [via #n disambig if used]
    each pron: chain from loop; first arc emits the word (+pron cost); the
    last arc forks to loop (nosilcost) and sil (silcost).
"""

from __future__ import annotations

import math

from .core import EPS, Fst


def add_lex_disambig(lexicon: list[tuple]) -> tuple[list[tuple], int]:
    """Add disambiguation symbols to a pronunciation lexicon.

    ``lexicon``: list of (word, pron_prob, phones tuple).  Returns
    (entries with ``disambig`` field = 0 or k for #k, max k used).
    A pron needs a disambig symbol if it is identical to another pron or is a
    prefix of another pron (reference: add_lex_disambig.cpp; same-pron entries
    get successive #1, #2, ...).
    """
    prons = [tuple(p[2]) for p in lexicon]
    count: dict[tuple, int] = {}
    for pr in prons:
        count[pr] = count.get(pr, 0) + 1
    prefixes = set()
    all_prons = set(prons)
    for pr in all_prons:
        for k in range(1, len(pr)):
            prefixes.add(pr[:k])

    last_used: dict[tuple, int] = {}
    max_disambig = 0
    out = []
    for (word, prob, phones) in lexicon:
        pr = tuple(phones)
        if count[pr] > 1 or pr in prefixes:
            cur = last_used.get(pr, 0) + 1
            # ensure a pron that is a prefix of another never shares a
            # disambig that the longer pron's continuation could mimic; simple
            # monotone assignment as in the reference
            last_used[pr] = cur
            max_disambig = max(max_disambig, cur)
            out.append((word, prob, pr, cur))
        else:
            out.append((word, prob, pr, 0))
    return out, max_disambig


def make_lexicon_fst(lexicon: list[tuple], phone_id, word_id,
                     sil_prob: float = 0.5, sil_phone: str = "SIL",
                     sil_disambig: str | None = None) -> Fst:
    """Build L (phones -> words).

    ``lexicon``: (word, pron_prob, phones tuple, disambig_k) — disambig_k=0
    means none, else phone symbol ``#k`` appended.  ``phone_id``/``word_id``:
    symbol -> id callables.  ``sil_disambig``: e.g. "#4" on the silence arc
    for L_disambig (fixes optional-silence nondeterminism).
    """
    f = Fst()
    if sil_prob > 0.0:
        if not (0.0 < sil_prob < 1.0):
            raise ValueError("sil_prob must be in (0,1)")
        sil_cost = -math.log(sil_prob)
        nosil_cost = -math.log(1.0 - sil_prob)
        start = f.add_state()  # 0
        loop = f.add_state()  # 1
        sil = f.add_state()  # 2
        f.set_start(start)
        f.set_final(loop, 0.0)
        f.add_arc(start, EPS, EPS, nosil_cost, loop)
        f.add_arc(start, EPS, EPS, sil_cost, sil)
        if sil_disambig is None:
            f.add_arc(sil, phone_id(sil_phone), EPS, 0.0, loop)
        else:
            d = f.add_state()
            f.add_arc(sil, phone_id(sil_phone), EPS, 0.0, d)
            f.add_arc(d, phone_id(sil_disambig), EPS, 0.0, loop)
    else:
        loop = f.add_state()
        f.set_start(loop)
        f.set_final(loop, 0.0)
        sil = None
        sil_cost = nosil_cost = 0.0

    for (word, prob, phones, disambig_k) in lexicon:
        pron_cost = -math.log(prob) if prob and prob < 1.0 else 0.0
        syms = [phone_id(p) for p in phones]
        if disambig_k:
            syms.append(phone_id(f"#{disambig_k}"))
        s = loop
        w_olabel = word_id(word)
        for i, ph in enumerate(syms):
            last = i == len(syms) - 1
            ol = w_olabel if i == 0 else EPS
            wcost = pron_cost if i == 0 else 0.0
            if not last:
                ns = f.add_state()
                f.add_arc(s, ph, ol, wcost, ns)
                s = ns
            else:
                if sil is None:
                    f.add_arc(s, ph, ol, wcost, loop)
                else:
                    f.add_arc(s, ph, ol, wcost + nosil_cost, loop)
                    f.add_arc(s, ph, ol, wcost + sil_cost, sil)
    f.arcsort("olabel")
    return f


def add_word_disambig_selfloops(f: Fst, phone_disambig_id: int,
                                word_disambig_id: int) -> Fst:
    """fstaddselfloops: let the LM backoff symbol #0 pass through L
    (self-loop ilabel=#0_phone / olabel=#0_word at the start and loop
    states — every inter-word position passes through them)."""
    targets = {f.start}
    for s in f.states():
        if f.is_final(s):
            targets.add(s)
    for s in targets:
        f.add_arc(s, phone_disambig_id, word_disambig_id, 0.0, s)
    f.arcsort("olabel")
    return f
