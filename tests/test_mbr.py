"""Confusion-network / MBR decoding tests (lattice-mbr-decode role)."""

import math

from voicebridge_tpu.steps.mbr import confusion_network, mbr_decode


class TestMbr:
    def test_unanimous(self):
        hyps = [(["YES", "NO"], -10.0), (["YES", "NO"], -11.0)]
        words, conf = mbr_decode(hyps)
        assert words == ["YES", "NO"]
        assert all(c > 0.99 for c in conf)

    def test_majority_vote_weighted(self):
        # two strong hyps say NO, one weak says YES at slot 2
        hyps = [(["YES", "NO"], -1.0), (["YES", "NO"], -1.2),
                (["YES", "YES"], -8.0)]
        words, conf = mbr_decode(hyps)
        assert words == ["YES", "NO"]
        assert conf[1] > 0.9

    def test_insertion_resolved_by_posterior(self):
        # minority hyp inserts an extra word; consensus drops it
        hyps = [(["NO"], -1.0), (["NO"], -1.1), (["NO", "YES"], -9.0)]
        words, _conf = mbr_decode(hyps)
        assert words == ["NO"]

    def test_confidences_sum_per_slot(self):
        hyps = [(["A"], -1.0), (["B"], -1.0)]
        net = confusion_network(hyps)
        assert len(net) == 1
        assert abs(sum(net[0].values()) - 1.0) < 1e-6

    def test_empty(self):
        assert mbr_decode([]) == ([], [])
