"""Render REPORT.md from a librispeech_shaped run's report.json.

Usage: python tools/make_report.py /tmp/ls_shaped_r2/report.json [bench.json]

The reference's integration oracle is TestLibriSpeech (real audio, 5.92% WER,
~25 min on 4 CPU cores, /root/reference/README.md:50); real LibriSpeech audio
is unobtainable offline, so the corpus here is the formant-synthesized
LibriSpeech-shaped stand-in (voicebridge_tpu/testing/) at comparable scale.
"""

import json
import sys
from pathlib import Path


def main():
    rj = Path(sys.argv[1])
    rep = json.loads(rj.read_text())
    bench = None
    if len(sys.argv) > 2 and Path(sys.argv[2]).exists():
        bench = json.loads(Path(sys.argv[2]).read_text())

    c = rep["corpus"]
    lines = [
        "# REPORT — end-to-end pipeline at LibriSpeech-shaped scale",
        "",
        "Counterpart of the reference's `TestLibriSpeech` integration oracle",
        "(`TestDll/TestDll/LibriSpeech.cpp:40-560`: data prep → dict+G2P → "
        "lang → LM →",
        "MFCC+CMVN → mono → tri1(deltas) → tri2b(LDA+MLLT) → tri3b(SAT) → "
        "HCLG → decode",
        "→ WER; oracle 5.92% WER / ~25 min on 4 CPU cores, "
        "`/root/reference/README.md:50`).",
        "Real LibriSpeech audio is unobtainable offline; this run uses the",
        "formant-synthesized LibriSpeech-shaped corpus "
        "(`voicebridge_tpu/testing/`),",
        "which preserves the shape of the task (speaker variation, ~200-word",
        "vocabulary, trigram LM, G2P-backed lexicon) but not its acoustics.",
        "",
        f"**Corpus**: {c['speakers']} speakers, {c['train_utts']} train / "
        f"{c['test_utts']} test utterances, {c['audio_s']:.0f}s audio.",
        "",
        "## WER by stage (best over the LMWT 7..17 × WIP {0, 0.5, 1} grid)",
        "",
        "| stage | WER % | ins | del | sub | LMWT |",
        "|---|---|---|---|---|---|",
    ]
    for k, w in rep["wer"].items():
        lines.append(f"| {k} | {w['wer']} | {w['ins']} | {w['del']} | "
                     f"{w['sub']} | {w['lmwt']} |")
    lines += [
        "",
        "## Per-stage wall time / throughput",
        "",
        "| stage | wall s | audio-s/s |",
        "|---|---|---|",
    ]
    for st in rep["stages"]:
        aps = (f"{st['audio_s'] / st['wall_s']:.1f}"
               if st.get("audio_s") else "—")
        lines.append(f"| {st['name']} | {st['wall_s']:.1f} | {aps} |")
    lines += ["", f"Total wall: **{rep['wall_s']:.0f}s**.", ""]
    if bench:
        lines += [
            "## Real-chip hot-path benchmarks (bench.py, 1× TPU v5e)",
            "",
            f"- decode: **{bench['value']} audio-s/s** "
            f"({bench['vs_baseline']}× the ≥100 north-star target) at "
            f"{bench['config']}",
        ]
        if "train_audio_seconds_per_sec_1chip" in bench:
            lines.append(
                f"- train EM: **{bench['train_audio_seconds_per_sec_1chip']}"
                f" audio-s/s** at {bench.get('train_config')}")
        lines.append("")
    lines += [
        "The end-to-end run above executes on whatever backend is available "
        "(this",
        "report's run used the 8-device virtual CPU mesh of the test "
        "harness when",
        "the TPU tunnel was saturated by benchmarks); the hot-path numbers "
        "come from",
        "the real chip via bench.py and SCALING.md.",
        "",
    ]
    Path("REPORT.md").write_text("\n".join(lines))
    print("wrote REPORT.md")


if __name__ == "__main__":
    main()
