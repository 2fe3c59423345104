"""Measure lattice-decode throughput vs FB window size on the real chip.

Justifies steps/decode.Decoder._lattice_window (W ~ sqrt(T) rounded to a
power of two in [16, 64]): runs decode_lattice on the real compiled bench
HCLG (tools/bench_real_graph.py) at several (T, W) points and prints
audio-s/s for each.  The window trades per-dispatch Python/tunnel overhead
(fewer, larger windows) against device residency S*(W + T/W) (more, smaller
windows) — see the decode_lattice memory model.

Usage: python tools/exp_lattice_window.py [--batch 32] [--frames 500,1000]
           [--windows 8,16,32,64]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", default="512,1024,2048")
    ap.add_argument("--windows", default="8,16,32,64,128")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--sentences", type=int, default=1200)
    args = ap.parse_args(argv)

    from tools.bench_real_graph import load_or_build, make_decoder

    hclg, tm, tree, _lang = load_or_build(args.sentences)
    decoder, _am, dim = make_decoder(hclg, tm, tree)
    rng = np.random.default_rng(5)
    b = args.batch

    for t in [int(x) for x in args.frames.split(",")]:
        feats = rng.standard_normal((b, t, dim)).astype(np.float32)
        nf = np.full(b, t, np.int32)
        utts = [f"u{i}" for i in range(b)]
        for w in [int(x) for x in args.windows.split(",")]:
            # pin the window by monkeypatching the policy for the experiment
            orig = decoder._lattice_window
            decoder._lattice_window = lambda _t, _w=w: _w
            try:
                decoder.decode_lattice(utts, feats, nf)  # compile
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    decoder.decode_lattice(utts, feats, nf)
                wall = (time.perf_counter() - t0) / args.iters
            finally:
                decoder._lattice_window = orig
            print(f"T={t:5d} W={w:3d}: {b * t * 0.01 / wall:8.1f} audio-s/s "
                  f"({wall:.2f}s/batch)", flush=True)


if __name__ == "__main__":
    main()
