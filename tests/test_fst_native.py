"""Cross-check the native (C++) WFST kernels against the Python reference
implementations on random functional FSTs."""

import random

import pytest

from voicebridge_tpu.fst import compose, determinize_star, minimize_encoded
from voicebridge_tpu.fst import native_bridge as nb
from voicebridge_tpu.fst.core import Fst, linear_fst

from test_fst import all_paths, assert_equivalent, random_functional_fst

pytestmark = pytest.mark.skipif(not nb.available(),
                                reason="native library not built")


class TestNativeParity:
    def test_compose_matches_python(self):
        rng = random.Random(2)
        for _ in range(5):
            a = random_functional_fst(rng, nsyms=4)
            b = Fst()
            s0 = b.add_state()
            b.set_start(s0)
            b.set_final(s0, 0.0)
            for sym in range(1, 5):
                b.add_arc(s0, sym, sym + 10, 0.05 * sym, s0)
            py = compose(a, b)
            nat = nb.compose(a, b)
            assert_equivalent(py, nat, max_len=5)

    def test_determinize_matches_python(self):
        rng = random.Random(9)
        for trial in range(6):
            f = random_functional_fst(rng)
            py = determinize_star(f)
            nat = nb.determinize_star(f)
            assert_equivalent(py, nat, max_len=6)

    def test_determinize_log_semiring(self):
        import math

        f = Fst()
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        p = 0.5
        f.add_arc(s0, 1, 1, -math.log(p), s1)
        f.add_arc(s0, 1, 1, -math.log(p), s2)
        f.set_final(s1, 0.0)
        f.set_final(s2, 0.0)
        nat = nb.determinize_star(f, use_log=True)
        paths = all_paths(nat)
        assert abs(paths[(1,)][0] - 0.0) < 1e-5

    def test_minimize_matches_python(self):
        rng = random.Random(4)
        for _ in range(5):
            f = determinize_star(random_functional_fst(rng))
            py = minimize_encoded(f)
            nat = nb.minimize_encoded(f)
            assert nat.num_states == py.num_states
            assert_equivalent(py, nat, max_len=6)

    def test_connect(self):
        f = Fst()
        s0, s1, s2 = (f.add_state() for _ in range(3))
        f.set_start(s0)
        f.add_arc(s0, 1, 1, 0.0, s1)
        f.add_arc(s2, 2, 2, 0.0, s1)  # unreachable
        f.set_final(s1, 0.5)
        out = nb.connect(f)
        assert out.num_states == 2 and out.num_arcs == 1
