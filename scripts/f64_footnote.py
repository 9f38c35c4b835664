#!/usr/bin/env python
"""Quantify the f32 protocol-cell bias against a matched f64 run.

The reference solves in double precision
(/root/reference/csrc/liars_dice/subgame_solving.h:39); our protocol
cells run the TPU-native f32 fast path.  results/XVAL.md showed the
full-tree e1 component is dtype-dominated at 1e-3 scale, so one full
protocol cell (same game/solver/net/repeats) is re-run under
``eval_all --f64 --platform cpu`` into results/f64/ and compared here
field by field.  Output: a markdown footnote appended to (or refreshed
in) results/PROTOCOL.md.

Usage: python scripts/f64_footnote.py
"""

from __future__ import annotations

import json
import pathlib
import re

# Anchored to the repo root (this file's parent's parent), not the cwd,
# so the footnote survives invocation from any directory.
_REPO = pathlib.Path(__file__).resolve().parent.parent
F32_GLOB = str(_REPO / "results/eval_{cell}_1024rep.json")
F64_DIR = _REPO / "results/f64"
MARKER = "## f64 cross-check"


def load_row(path: pathlib.Path):
    recs = json.loads(path.read_text())
    return recs[0] if isinstance(recs, list) else recs


def main() -> None:
    lines = [MARKER, ""]
    lines += [
        "The reference's solver math is double precision"
        " (subgame_solving.h:39); the protocol cells above use the f32",
        "fast path. The same cell (same net, same 1024x1024 protocol,",
        "same per-seed strategies) re-run with `eval_all --f64",
        "--platform cpu` measures the end-to-end f32 bias per report",
        "field:",
        "",
    ]
    found = False
    # Completed f64 cells, else their streamed partials (a CPU f64 run
    # takes many hours; a 512-repeat partial still quantifies the bias
    # at every matched power-of-2 repeat count).
    candidates = {}
    for f64_path in sorted(F64_DIR.glob("eval_*_1024rep.json.*partial")):
        cell = re.match(
            r"eval_(.+)_1024rep\.json", f64_path.name
        ).group(1)
        candidates[cell] = f64_path
    for f64_path in sorted(F64_DIR.glob("eval_*_1024rep.json")):
        cell = re.match(r"eval_(.+)_1024rep\.json", f64_path.name).group(1)
        candidates[cell] = f64_path
    for cell, f64_path in sorted(candidates.items()):
        f32_path = pathlib.Path(F32_GLOB.format(cell=cell))
        if not f32_path.exists():
            continue
        a, b = load_row(f32_path), load_row(f64_path)
        partial_note = ""
        if b.get("partial"):
            reps_done = (b.get("sampled_reports") or [{}])[-1].get(
                "repeats", 0
            )
            partial_note = f" — f64 side is a partial at {reps_done} reps"
            b = dict(
                b,
                full_tree=b.get("exploitability", {}).get("full_tree"),
                rebel=None,
            )
        def net_key(rec):
            # Compare by exp-dir basename + params filename: the same
            # net file is cited as outputs/liars_sp/<exp>/... by
            # round-4 evals and results/liars_sp/<exp>/... after the
            # round-5 tracking policy moved run dirs under results/.
            net = rec.get("net") or ""
            import os
            return (
                os.path.basename(os.path.dirname(os.path.dirname(net))),
                os.path.basename(net),
            )

        if net_key(a) != net_key(b):
            lines.append(
                f"(skipping {cell}: f32 cell now cites a different net "
                f"`{a.get('net')}` than the f64 run `{b.get('net')}`)"
            )
            lines.append("")
            continue
        found = True
        lines.append(
            f"### {a['game']} {a['solver']} (net `{a['net']}`)"
            f"{partial_note}"
        )
        lines.append("")
        lines.append("| field | f32 | f64 | delta |")
        lines.append("|---|---|---|---|")
        for field in ("full_tree", "rebel"):
            va, vb = a.get(field), b.get(field)
            if va is None or vb is None:
                continue
            lines.append(
                f"| {field} | {va:.6f} | {vb:.6f} | {va - vb:+.6f} |"
            )
        ra = {r["repeats"]: r for r in a.get("sampled_reports") or []}
        rb = {r["repeats"]: r for r in b.get("sampled_reports") or []}
        for reps in sorted(set(ra) & set(rb)):
            if reps not in (1, 64, 1024):
                continue
            lines.append(
                f"| exploitability @{reps} reps "
                f"| {ra[reps]['exploitability']:.6f} "
                f"| {rb[reps]['exploitability']:.6f} "
                f"| {ra[reps]['exploitability'] - rb[reps]['exploitability']:+.6f} |"
            )
            lines.append(
                f"| ev_vs_full @{reps} reps "
                f"| {ra[reps]['ev_full']:.6f} "
                f"| {rb[reps]['ev_full']:.6f} "
                f"| {ra[reps]['ev_full'] - rb[reps]['ev_full']:+.6f} |"
            )
        lines.append("")
    if not found:
        print("no matched f32/f64 cell pairs; nothing to write")
        return

    proto = _REPO / "results/PROTOCOL.md"
    text = proto.read_text()
    if MARKER in text:
        text = text[: text.index(MARKER)].rstrip() + "\n\n"
    proto.write_text(text + "\n".join(lines) + "\n")
    print(f"appended f64 cross-check to {proto}")


if __name__ == "__main__":
    main()
