#!/usr/bin/env python
"""Engine/dtype ladder: same cell, same net, same seeds — different math.

The production protocol cells run the fused Pallas kernel, which
computes the in-loop MLP in bfloat16 on real TPU (the f32 exact-GELU
kernel RET_CHECK-faults in Mosaic; results/KERNEL_TUNING.md).  The
reference solves everything in float64
(/root/reference/csrc/liars_dice/subgame_solving.h:39).  To bound what
the dtype choices do to a *published cell*, the same
(game, solver, net) cell is re-run on each available rung:

- ``pallas``: fused kernel — f32 solver, bf16 MLP (production path)
- ``fast``:   XLA grid engine — f32 solver, f32 MLP
- ``fast --f64`` (results/f64/): f64 solver, f64 MLP (reference math)

Per-seed sampled strategies are deterministic in the seed index, so
the rungs differ only in arithmetic.  This script groups completed
eval JSONs by (game, solver, net file), and appends a comparison table
to results/PROTOCOL.md for every cell with at least two rungs.

Chained from scripts/protocol_table.py after the f64 footnote (which
truncates the file at its own marker — so the ladder must re-append
after every regeneration).

Usage: python scripts/dtype_ladder.py
"""

from __future__ import annotations

import json
import os
import pathlib

_REPO = pathlib.Path(__file__).resolve().parent.parent
MARKER = "## Engine/dtype ladder"


def load_rows(path: pathlib.Path):
    try:
        recs = json.loads(path.read_text())
    except Exception:
        return []
    return recs if isinstance(recs, list) else [recs]


def rung_label(rec: dict, path: pathlib.Path) -> str:
    if "f64" in path.parts:
        return "fast f64 (reference math, CPU)"
    if (rec.get("engine") or "fast") == "pallas":
        return "pallas f32 / bf16 net (production)"
    return "fast f32"


def main() -> None:
    groups: dict[tuple, dict] = {}
    paths = sorted((_REPO / "results").glob("eval_*_1024rep.json"))
    paths += sorted((_REPO / "results/f64").glob("eval_*_1024rep.json"))
    for path in paths:
        for rec in load_rows(path):
            reps = rec.get("sampled_reports") or []
            if not reps or reps[-1].get("repeats") != 1024:
                continue
            net = rec.get("net") or ""
            exp = os.path.basename(os.path.dirname(os.path.dirname(net)))
            key = (
                rec.get("game"), rec.get("solver"),
                f"{exp}/{os.path.basename(net)}",
            )
            rung = rung_label(rec, path)
            # Keep one eval per rung (newest file wins on re-runs).
            groups.setdefault(key, {})[rung] = rec
    lines = [MARKER, ""]
    lines += [
        "Same (game, solver, net, seeds), different arithmetic — the",
        "end-to-end bias of the production kernel's f32 solve / bf16 MLP",
        "against the XLA grid engine's f32 and the reference's f64 math",
        "(per-seed strategies are deterministic in the seed index, so",
        "rungs differ only in dtype/engine rounding):",
        "",
        "Direction (round 5): **the production bf16 path never",
        "measures materially worse than f32, and usually better** —",
        "pallas-bf16 ≤ fast-f32 on 1x4 cfr (0.0076 vs 0.0224), 1x4 fp",
        "(0.0280 vs 0.0363) and 1x5 cfr (0.0181 vs 0.0201), and",
        "fast-f32 ≤ fast-f64 on the one cell with an f64 rung (0.0231",
        "vs 0.0273).  The magnitude varies (3x, 1.3x, 1.1x, 1.2x), and",
        "it is not universal: the 1x6 cfr fast rung (streamed partial,",
        "hard-stopped at 256 repeats) reads 0.0201 vs pallas's 0.0217",
        "at the matched 256-repeat row — parity-to-slightly-reversed,",
        "within the repeat noise seen in the convergence tables.",
        "The exploitability of a *given*",
        "averaged strategy is computed identically (exact best",
        "response) on every rung, so this is a property of the",
        "strategies produced, not of the measurement: per-iteration",
        "rounding noise perturbs each repeat's sampled solve",
        "differently, and the 1024-repeat reach-weighted mixture of",
        "more-decorrelated strategies is genuinely harder to exploit —",
        "rounding acting as exploration, the same mechanism the",
        "protocol's repeat-averaging exists to exploit.  (Mechanism",
        "plausible but not isolated; an f32+injected-noise ablation",
        "would separate rounding from engine-order effects.)",
        "",
    ]
    found = False
    for key in sorted(groups):
        rungs = groups[key]
        if len(rungs) < 2:
            continue
        found = True
        game, solver, net = key
        order = sorted(rungs)  # fast f32, fast f64, pallas — stable
        lines.append(f"### {game} {solver} (net `{net}`)")
        lines.append("")
        lines.append("| field | " + " | ".join(order) + " |")
        lines.append("|---|" + "---|" * len(order))

        def row(field, get):
            vals = []
            for rung in order:
                v = get(rungs[rung])
                vals.append("—" if v is None else f"{v:.6f}")
            lines.append(f"| {field} | " + " | ".join(vals) + " |")

        row("full_tree", lambda r: r.get("full_tree"))
        row("rebel (1024 reps)", lambda r: r.get("rebel"))
        for n in (1, 64, 1024):
            row(
                f"exploitability @{n}",
                lambda r, n=n: next(
                    (
                        x["exploitability"]
                        for x in r.get("sampled_reports") or []
                        if x["repeats"] == n
                    ),
                    None,
                ),
            )
            row(
                f"ev_vs_full @{n}",
                lambda r, n=n: next(
                    (
                        x.get("ev_full")
                        for x in r.get("sampled_reports") or []
                        if x["repeats"] == n
                    ),
                    None,
                ),
            )
        lines.append("")
    if not found:
        print("no cell has >=2 engine/dtype rungs; nothing to write")
        return
    proto = _REPO / "results/PROTOCOL.md"
    text = proto.read_text()
    if MARKER in text:
        text = text[: text.index(MARKER)].rstrip() + "\n\n"
    proto.write_text(text.rstrip() + "\n\n" + "\n".join(lines) + "\n")
    print(f"appended engine/dtype ladder to {proto}")


if __name__ == "__main__":
    main()
