"""Render REPORT.md from librispeech_shaped run reports (one per condition).

Usage: python tools/make_report.py LABEL=path/report.json [LABEL2=...]
           [--bench bench.json] [--real-graph real_graph.json]
           [--out REPORT.md]

The reference's integration oracle is TestLibriSpeech (real audio, 5.92% WER,
~25 min on 4 CPU cores, /root/reference/README.md:50); real LibriSpeech audio
is unobtainable offline, so the corpus here is the formant-synthesized
LibriSpeech-shaped stand-in (voicebridge_tpu/testing/) at comparable scale,
run at a clean (SNR 30 dB) and a noisy (low-SNR) condition — the noisy one
gives the model ladder room to separate.
"""

import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="LABEL=path/report.json")
    ap.add_argument("--bench", default=None)
    ap.add_argument("--real-graph", default=None)
    ap.add_argument("--notes", default=None,
                    help="markdown file appended verbatim (analysis)")
    ap.add_argument("--out", default="REPORT.md")
    args = ap.parse_args()

    runs = []
    for spec in args.runs:
        label, _, path = spec.partition("=")
        runs.append((label, json.loads(Path(path).read_text())))
    bench = (json.loads(Path(args.bench).read_text())
             if args.bench and Path(args.bench).exists() else None)
    realg = (json.loads(Path(args.real_graph).read_text())
             if args.real_graph and Path(args.real_graph).exists() else None)

    c = runs[0][1]["corpus"]
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
        "Real LibriSpeech audio is unobtainable offline; these runs use the",
        "formant-synthesized LibriSpeech-shaped corpus "
        "(`voicebridge_tpu/testing/`),",
        "which preserves the shape of the task (speaker variation, ~200-word",
        "vocabulary, trigram LM, G2P-backed lexicon) but not its acoustics.",
        "",
        f"**Corpus**: {c['speakers']} speakers, {c['train_utts']} train / "
        f"{c['test_utts']} test utterances, {c['audio_s']:.0f}s audio; "
        "full iteration counts (20 mono iters / 14 triphone iters), decoded "
        "through the production lattice-generating path with the full "
        "(LMWT 7..17 × WIP {0, .5, 1}) scoring grid.",
        "",
        "## WER by stage and condition (best grid point)",
        "",
        "| stage | " + " | ".join(
            f"{lbl} WER % (ins/del/sub)" for lbl, _ in runs) + " |",
        "|---|" + "---|" * len(runs),
    ]
    stages = list(runs[0][1]["wer"])
    for k in stages:
        cells = []
        for _lbl, rep in runs:
            w = rep["wer"].get(k)
            cells.append(f"{w['wer']} ({w['ins']}/{w['del']}/{w['sub']})"
                         if w else "—")
        lines.append(f"| {k} | " + " | ".join(cells) + " |")
    lines += [""]
    for lbl, rep in runs:
        snr = rep.get("snr_db")
        if snr is None:
            snr = 30.0  # pre-knob runs used the default clean condition
        lines += [
            f"### {lbl} (SNR {snr} dB) — per-stage wall time / throughput",
            "",
            "| stage | wall s | audio-s/s |",
            "|---|---|---|",
        ]
        stages = rep["stages"]
        items = (stages.items() if isinstance(stages, dict)
                 else ((st["name"], st) for st in stages))
        for name, st in items:
            aps = (f"{st['audio_s'] / st['wall_s']:.1f}"
                   if st.get("audio_s") else "—")
            lines.append(f"| {name} | {st['wall_s']:.1f} | {aps} |")
        wall = f"Total wall: **{rep['wall_s']:.0f}s**"
        if rep.get("wall_s_warm_run"):
            wall += (f" first full run (cold jit) / "
                     f"**{rep['wall_s_warm_run']:.0f}s** warm re-run "
                     f"(training mtime-skipped, compile cache hot)")
        lines += ["", wall +
                  " (reference: ~25 min for its smaller real corpus).", ""]
    if bench:
        lines += [
            "## Real-chip hot-path benchmarks (bench.py, 1× TPU v5e)",
            "",
            f"- decode (synthetic 60k-state graph, best-path): "
            f"**{bench['value']} audio-s/s** "
            f"({bench['vs_baseline']}× the ≥100 north-star target) at "
            f"{bench['config']}",
        ]
        if "train_audio_seconds_per_sec_1chip" in bench:
            lines.append(
                f"- train EM: **{bench['train_audio_seconds_per_sec_1chip']}"
                f" audio-s/s** at {bench.get('train_config')}")
        lines.append("")
    if realg:
        g = realg["graph"]
        lines += [
            "## Real compiled-HCLG decode (tools/bench_real_graph.py, "
            "1× TPU v5e)",
            "",
            f"Graph: {g['states']} states / {g['arcs_eps_free']} eps-free "
            f"arcs ({g['rows']} EmitPlan rows, d={g['d']}), built by the "
            "repo's own `fst/hclg.py mkgraph` from the testing lexicon + "
            "mod-KN trigram — real epsilon structure and non-dst-pure "
            "states, unlike bench.py's idealized synthetic graph.",
            "",
        ]
        for mode in ("best_path", "lattice", "lattice_real"):
            if mode in realg:
                m = realg[mode]
                lines.append(
                    f"- {mode}: **{m['audio_s_per_s']} audio-s/s** at "
                    f"batch {m['batch']} × {m['frames']} frames")
        if realg.get("note"):
            lines += ["", realg["note"]]
        lines.append("")
    if args.notes and Path(args.notes).exists():
        lines += [Path(args.notes).read_text().rstrip(), ""]
    Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
