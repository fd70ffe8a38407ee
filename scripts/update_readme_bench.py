#!/usr/bin/env python
"""Regenerate the README "Measured" table from the checked-in bench artifacts.

One source of truth: every number in the README benchmark block is read from
BENCH_LAST.json (bench.py) and the newest BENCH_DATASET_r*.json and
BENCH_SCALE_r*.json — never typed by hand (VERDICT r2 item 5: "no number in
README that isn't reproducible from a checked-in artifact + script").

    python scripts/update_readme_bench.py [--check]

--check exits non-zero if the README block differs from the regenerated one
(use in review: a stale README fails the check).
"""
import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

BEGIN = "| metric | this repo | reference (L20, Triton+TRT-LLM) |"

# Reference numbers from BASELINE.md (runtime/triton_trtllm/README.md:89-94)
REF = {
    "offline_rtf": {1: 0.1362, 2: 0.0737, 4: 0.0704},
    "streaming_rtf": {1: 0.1501, 2: 0.0862, 4: 0.0824},
    "first_chunk_ms": {1: 210, 2: 226, 4: 1018},
}


def _rows(dataset):
    out = {}
    for r in dataset["runs"]:
        out[(r["mode"], r.get("concurrency", 1))] = r
    return out


def _latest(pattern):
    """Newest round's artifact (BENCH_DATASET_r04.json over _r03 etc.),
    ordered by the PARSED round number — lexicographic path order would
    mis-sort r100 below r99 and silently pick the wrong round for an
    unpadded tag like r4."""
    paths = sorted(
        (p for p in ROOT.glob(pattern) if re.search(r"_r(\d+)\.json$", p.name)),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p.name).group(1)),
    )
    if not paths:
        sys.exit(f"no artifact matches {pattern}")
    return paths[-1]


def build_table():
    last = json.loads((ROOT / "BENCH_LAST.json").read_text())
    dataset_path = _latest("BENCH_DATASET_r*.json")
    scale_path = _latest("BENCH_SCALE_r*.json")
    data = _rows(json.loads(dataset_path.read_text()))
    scale = _rows(json.loads(scale_path.read_text()))

    def rtf(mode, concs):
        return " / ".join(f"{data[(mode, c)]['rtf']:.3f}" for c in concs)

    def fc(concs):
        return " / ".join(
            f"{data[('continuous_streaming', c)]['first_chunk_p50_ms']:.0f}"
            for c in concs
        )

    speedup = last["vs_baseline"]
    grpc_concs = sorted(
        c for (m, c) in data if m == "grpc_streaming" and c in (1, 2, 4)
    )
    grpc_fc = " / ".join(
        "{:.0f}".format(data[("grpc_streaming", c)]["first_chunk_p50_ms"])
        for c in grpc_concs
    )
    lines = [
        BEGIN,
        "|---|---|---|",
        f"| offline RTF, single stream (`bench.py`) | **{last['value']:.3f}** "
        f"| 0.1362 (**{speedup:.1f}× faster**) |",
        f"| offline dataset RTF, conc 1 / 2 / 4 | **{rtf('offline', (1, 2, 4))}** "
        f"| 0.1362 / 0.0737 / 0.0704 |",
        f"| streaming dataset RTF, conc 1 / 2 / 4 | **{rtf('continuous_streaming', (1, 2, 4))}** "
        f"| 0.1501 / 0.0862 / 0.0824 |",
        f"| streaming first-chunk P50, conc 1 / 2 / 4 | **{fc((1, 2, 4))} ms** "
        f"| 210 / 226 / 1018 ms |",
        f"| gRPC streaming RTF, conc {' / '.join(map(str, grpc_concs))} | "
        f"**{rtf('grpc_streaming', grpc_concs)}** | 0.1501 / 0.0862 / 0.0824 |",
        f"| gRPC first-chunk P50, conc {' / '.join(map(str, grpc_concs))} | "
        f"**{grpc_fc} ms** | 210 / 226 / 1018 ms |",
    ]
    lf = data.get(("continuous_streaming_longform", 1))
    if lf:
        lines.append(
            f"| longform streaming (3-segment, voice-stable) RTF / first-chunk P50 | "
            f"**{lf['rtf']:.3f} / {lf['first_chunk_p50_ms']:.0f} ms** "
            f"| n/a (reference truncates at the token budget) |"
        )
    if ("offline", 8) in scale and ("offline", 16) in scale:
        r8, r16 = scale[("offline", 8)], scale[("offline", 16)]
        agg = round(1.0 / r16["rtf"])
        lines.append(
            f"| offline dataset RTF, conc 8 / 16 (`{scale_path.name}`) | "
            f"**{r8['rtf']:.4f} / {r16['rtf']:.4f}** ({agg}× realtime aggregate) "
            f"| not published (stops at conc 4) |"
        )
    if ("continuous_streaming", 8) in scale and ("continuous_streaming", 16) in scale:
        s8 = scale[("continuous_streaming", 8)]
        s16 = scale[("continuous_streaming", 16)]
        lines.append(
            f"| streaming first-chunk P50, conc 8 / 16 (`{scale_path.name}`) | "
            f"**{s8['first_chunk_p50_ms']:.0f} / {s16['first_chunk_p50_ms']:.0f} ms** "
            f"| not published (conc-4 figure: 1018 ms) |"
        )
    # sanity: fail loudly if any measured cell no longer beats the reference
    losses = []
    for c in (1, 2, 4):
        if data[("offline", c)]["rtf"] >= REF["offline_rtf"][c]:
            losses.append(f"offline conc {c}")
        if data[("continuous_streaming", c)]["rtf"] >= REF["streaming_rtf"][c]:
            losses.append(f"streaming conc {c}")
        if (
            data[("continuous_streaming", c)]["first_chunk_p50_ms"]
            >= REF["first_chunk_ms"][c]
        ):
            losses.append(f"first-chunk conc {c}")
    return "\n".join(lines) + "\n", losses


def build_notes_table():
    last = json.loads((ROOT / "BENCH_LAST.json").read_text())
    dataset_path = _latest("BENCH_DATASET_r*.json")
    data = _rows(json.loads(dataset_path.read_text()))
    tag = dataset_path.stem.split("_")[-1]  # e.g. r04

    def rtf(mode, concs):
        return " / ".join(f"{data[(mode, c)]['rtf']:.3f}" for c in concs)

    def ratio(mode, ref, concs, inv=False):
        out = []
        for c in concs:
            v = data[(mode, c)]["rtf"] if not inv else data[(mode, c)][
                "first_chunk_p50_ms"
            ]
            out.append(f"{ref[c] / v:.1f}")
        return " / ".join(out) + "×"

    def fc(concs):
        return " / ".join(
            f"{data[('continuous_streaming', c)]['first_chunk_p50_ms']:.0f}"
            for c in concs
        )

    g = data[("grpc_streaming", 1)]
    return "\n".join(
        [
            "| metric | value | reference (L20) | speedup |",
            "|---|---|---|---|",
            f"| offline RTF, 1 stream (bench.py → BENCH_LAST.json) | "
            f"**{last['value']:.4f}** | 0.1362 | **{last['vs_baseline']:.2f}×** |",
            f"| offline dataset RTF conc 1/2/4 ({tag}) | "
            f"**{rtf('offline', (1, 2, 4))}** | 0.1362 / 0.0737 / 0.0704 | "
            f"{ratio('offline', REF['offline_rtf'], (1, 2, 4))} |",
            f"| streaming dataset RTF conc 1/2/4 ({tag}) | "
            f"**{rtf('continuous_streaming', (1, 2, 4))}** | 0.1501 / 0.0862 / 0.0824 | "
            f"{ratio('continuous_streaming', REF['streaming_rtf'], (1, 2, 4))} |",
            f"| streaming first-chunk P50 conc 1/2/4 | **{fc((1, 2, 4))} ms** | "
            f"210 / 226 / 1018 ms | "
            f"{ratio('continuous_streaming', REF['first_chunk_ms'], (1, 2, 4), inv=True)} |",
            f"| gRPC streaming conc 1 (grpcio transport) | RTF **{g['rtf']:.3f}**, "
            f"first-chunk P50 **{g['first_chunk_p50_ms']:.0f} ms** | 0.1501 / 210 ms | "
            f"{0.1501 / g['rtf']:.1f} / {210 / g['first_chunk_p50_ms']:.1f}× |",
        ]
    ) + "\n"


def _splice(text, header_re, table):
    m = re.search(header_re, text, re.M)
    if not m:
        return None
    return text[: m.start()] + table + text[m.end() :]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    table, losses = build_table()
    if losses:
        print("WARNING: cells not beating reference:", ", ".join(losses))
    stale = []
    targets = [
        (ROOT / "README.md", r"^\| metric \|[^\n]*\n(?:\|[^\n]*\n)+", table),
        (
            ROOT / "BENCH_NOTES.md",
            r"^\| metric \| value \| reference \(L20\) \| speedup \|\n(?:\|[^\n]*\n)+",
            build_notes_table(),
        ),
    ]
    for path, pattern, tbl in targets:
        text = path.read_text()
        new = _splice(text, pattern, tbl)
        if new is None:
            sys.exit(f"{path.name}: measured table not found")
        if new != text:
            stale.append(path.name)
            if not args.check:
                path.write_text(new)
    if args.check:
        if stale:
            print("stale bench tables:", ", ".join(stale))
            sys.exit(1)
        print("bench tables match artifacts")
    else:
        print("updated:" if stale else "already up to date:", ", ".join(stale) or "-")


if __name__ == "__main__":
    main()
