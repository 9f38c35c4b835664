#!/usr/bin/env python
"""Aggregate the paper-protocol eval results into the reference's pivot table.

The reference's ``scripts/eval_all.py`` ends by pivoting per-(game, solver)
exploitability into a ``full_tree`` vs ``rebel`` table
(/root/reference/scripts/eval_all.py:124-158).  Here each protocol eval
(1024 subgame iters x 1024 repeats) is a JSON file under ``results/``
written by our ``scripts/eval_all.py --out``; this script merges them into
one table plus the power-of-2 repeat convergence rows, and writes
``results/PROTOCOL.md``.

Usage: python scripts/protocol_table.py [--glob 'results/eval_*.json']
"""
import argparse
import glob
import json
import os
import pathlib

# Defaults anchored to the repo root so invocation from any cwd works.
_REPO = pathlib.Path(__file__).resolve().parent.parent


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--glob", default=str(_REPO / "results/eval_*.json"))
    ap.add_argument("--out", default=str(_REPO / "results/PROTOCOL.md"))
    args = ap.parse_args()

    rows = []
    for path in sorted(glob.glob(args.glob)):
        for rec in json.load(open(path)):
            rec["_file"] = os.path.basename(path)
            rec["_mtime"] = os.path.getmtime(path)
            reps = rec.get("sampled_reports") or []
            rec["_max_reps"] = reps[-1]["repeats"] if reps else 0
            if 0 < rec["_max_reps"] < 1024:
                rec["solver"] += f" ({rec['_max_reps']} reps)"
            rows.append(rec)
    all_rows = list(rows)
    # One row per (game, base solver): keep the deepest-repeat complete
    # run; at equal repeats the newest eval wins (a retrained net's
    # protocol rerun supersedes the old cell).
    best = {}
    for rec in rows:
        key = (rec["game"], rec["solver"].split(" ")[0])
        if key not in best or (rec["_max_reps"], rec["_mtime"]) > (
            best[key]["_max_reps"], best[key]["_mtime"]
        ):
            best[key] = rec
    rows = list(best.values())
    # Leftover streaming snapshots from timeout-killed evals
    # (<out>.<game>-<solver>.partial, written by scripts/eval_all.py):
    # surface them as annotated rows rather than dropping the work.  A
    # partial still wins over a complete row with *fewer* repeats (e.g.
    # a 512-repeat snapshot of a killed 1024-rep rerun beats a finished
    # 256-rep run).
    best_reps = {
        (r["game"], r["solver"].split(" ")[0]): r["_max_reps"] for r in rows
    }
    for path in sorted(glob.glob(args.glob + ".*partial")):
        tag = os.path.basename(path).rsplit(".", 2)[-2]
        if "-" not in tag:
            continue
        gstr, solver = tag.split("-", 1)
        rec = json.load(open(path))
        reps = rec.get("sampled_reports") or []
        preps = reps[-1]["repeats"] if reps else 0
        if preps <= best_reps.get((gstr, solver), -1):
            continue
        rows = [
            r for r in rows
            if (r["game"], r["solver"].split(" ")[0]) != (gstr, solver)
        ]
        rows.append(
            {
                "game": gstr,
                "solver": solver + f" (partial, {reps[-1]['repeats']} reps)"
                if reps else solver + " (partial, phase 1 only)",
                "net": rec.get("net"),
                "full_tree": rec.get("exploitability", {}).get("full_tree"),
                "rebel": reps[-1]["exploitability"] if reps else None,
                "sampled_reports": reps,
                "_file": os.path.basename(path),
            }
        )
    if not rows:
        raise SystemExit(f"no eval files match {args.glob}")

    rows.sort(key=lambda r: (r["game"], r["solver"]))
    lines = [
        "# Paper-protocol evaluation (1024 subgame iters x 1024 repeats)",
        "",
        "Protocol: `--mdp_depth 2 --subgame_iters 1024 --num_repeats 1024`",
        "per game x solver, matching the reference's released-checkpoint",
        "sweep (/root/reference/scripts/eval_all.py:33-44,61-104).",
        "`full_tree` = exploitability of the unaided 1024-iteration full-tree",
        "solve; `rebel` = exploitability of the reach-weighted average of 1024",
        "sampled recursive-to-leaf strategies driven by the trained net.",
        "",
        "The paper's exploitability table (arXiv:2007.13544) is not",
        "reproducible in this offline environment (no network egress to fetch",
        "the paper, its released checkpoints, or its exact numbers); the",
        "cross-checks here are the full-tree baselines above, the reference's",
        "own protocol/tooling semantics (golden-parity tests), and repeat-count",
        "convergence below.",
        "",
        "Each cell cites the checkpoint released for that (game, solver) —",
        "ties at equal repeats go to the newest eval, so re-designating a",
        "cell's released net is a touch of its eval file.  Every protocol",
        "eval ever run is kept under results/ (e.g. the canonical epoch-990",
        "1x4 fp retrain evaluated at 0.0437, worse than the released",
        "epoch-180 net's 0.0343 — the only game where the canonical budget",
        "did not improve the FP cell; see eval_1x4f_fp_r4_1024rep.json).",
        "",
        "| game | solver | full_tree | rebel | net |",
        "|---|---|---|---|---|",
    ]
    def fmt(v):
        return f"{v:.4f}" if v is not None else "—"

    def net_display(net):
        """Short display name + availability of the cited params file.

        Eval JSONs stamp the net path as trained (often under the
        untracked ``outputs/``); surviving nets are re-homed to
        ``results/liars_sp/<exp>/ckpt/`` per results/POLICY.md, so check
        there too.  A net found in neither is annotated ``(net lost)``
        — the eval JSON is then the only surviving record of the cell
        (the round-4 -> round-5 boundary lost every params file that
        had not been force-added; see the provenance note below)."""
        if not net or "/" not in net:
            return net or "none", False
        exp = os.path.basename(os.path.dirname(os.path.dirname(net)))
        base = os.path.basename(net)
        short = f"{exp}/{base}"
        exists = (
            (_REPO / net).exists()
            or pathlib.Path(net).exists()
            or (_REPO / "results/liars_sp" / exp / "ckpt" / base).exists()
        )
        return short, not exists

    any_lost = False
    for r in rows:
        net, lost = net_display(r.get("net"))
        any_lost |= lost
        lines.append(
            f"| {r['game']} | {r['solver']} | {fmt(r['full_tree'])} "
            f"| {fmt(r['rebel'])} | `{net}`{' (net lost)' if lost else ''} |"
        )
    if any_lost:
        lines += [
            "",
            "Cells marked *(net lost)* cite a checkpoint whose params file",
            "no longer exists: run dirs lived under the untracked",
            "``outputs/`` and only force-added cited nets survived the",
            "round-4 container reset (results/POLICY.md). The eval JSON is",
            "the surviving record; the cell is superseded as soon as a",
            "retrained canonical net posts a complete 1024-repeat eval.",
        ]

    # Per-cell checkpoint sweeps: every complete 1024-repeat eval ever
    # run for the cell, so the released number is visibly the best of a
    # multi-checkpoint sweep (the reference evaluates three epochs per
    # run, /root/reference/scripts/eval_all.py:35) rather than a single
    # lucky draw.  The cited row is the one in the table above.
    cited = {
        (r["game"], r["solver"].split(" ")[0]): r.get("_file") for r in rows
    }
    sweeps = {}
    for rec in all_rows:
        if rec["_max_reps"] != 1024 or rec.get("rebel") is None:
            continue
        key = (rec["game"], rec["solver"].split(" ")[0])
        sweeps.setdefault(key, []).append(rec)
    sweep_lines = []
    sweep_lost = False
    for key in sorted(sweeps):
        group = sorted(sweeps[key], key=lambda r: r["rebel"])
        if len(group) < 2:
            continue
        sweep_lines.append(f"### {key[0]} {key[1]}")
        sweep_lines.append("")
        sweep_lines.append("| net | rebel | cited |")
        sweep_lines.append("|---|---|---|")
        for r in group:
            net, lost = net_display(r.get("net"))
            sweep_lost |= lost
            mark = "**yes**" if r.get("_file") == cited.get(key) else ""
            sweep_lines.append(
                f"| `{net}`{' (net lost)' if lost else ''} "
                f"| {r['rebel']:.4f} | {mark} |"
            )
        sweep_lines.append("")
    if sweep_lines:
        lines += [
            "",
            "## Checkpoint sweeps per cell (every complete 1024-rep eval)",
            "",
            "The reference's convention evaluates three checkpoints per",
            "run (epochs 980/1000/1020,",
            "/root/reference/scripts/eval_all.py:35) to absorb",
            "checkpoint-to-checkpoint variance.  The analog here is the",
            "union of every complete 1024-repeat eval per cell, across",
            "runs and epochs; the r5_1x4fp sweep (five epochs of one",
            "canonical run, spread 0.0280-0.0496) measures that variance",
            "directly.  A within-±20-epochs triple is not reproducible",
            "for the other canonical runs: only each run's designated",
            "epoch-990 params survived the round-4 container reset",
            "(results/POLICY.md), and no full training state exists to",
            "resume a run to its 1010/1030 neighbors.",
            "",
        ] + sweep_lines
        if sweep_lost and not any_lost:
            lines += [
                "Rows marked *(net lost)*: the params file behind the",
                "record no longer exists (untracked checkpoints did not",
                "survive the round-4 container reset; results/POLICY.md).",
                "Such records are never designated as the cited cell while",
                "a reproducible record exists — the reference's convention",
                "releases the checkpoint behind every published number.",
                "",
            ]

    lines += [
        "",
        "## Convergence in repeat count (exploitability at power-of-2 repeats)",
        "",
    ]
    for r in rows:
        reps = r.get("sampled_reports") or []
        if not reps:
            continue
        lines.append(f"### {r['game']} {r['solver']}")
        lines.append("")
        lines.append("| repeats | exploitability | ev_vs_full |")
        lines.append("|---|---|---|")
        for rep in reps:
            lines.append(
                f"| {rep['repeats']} | {rep['exploitability']:.4f} "
                f"| {rep.get('ev_full', float('nan')):.4f} |"
            )
        lines.append("")

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(rows)} rows)")
    # Re-apply the f64 cross-check footnote (scripts/f64_footnote.py)
    # if matched f32/f64 cells exist — regeneration must not lose it.
    # Paths are resolved (not string-compared) and the sibling module is
    # imported relative to this file, so invocation from any cwd — or as
    # an imported module — keeps the footnote.
    repo = _REPO
    if (
        pathlib.Path(args.out).resolve()
        == (repo / "results/PROTOCOL.md").resolve()
        and (repo / "results/f64").is_dir()
    ):
        try:
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "f64_footnote", repo / "scripts/f64_footnote.py"
            )
            f64_footnote = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(f64_footnote)
            f64_footnote.main()
        except Exception as e:  # footnote is best-effort decoration
            print(f"(f64 footnote skipped: {type(e).__name__}: {e})")
        # The engine/dtype ladder re-appends AFTER the f64 footnote,
        # whose marker-truncation would otherwise erase it.
        try:
            spec = importlib.util.spec_from_file_location(
                "dtype_ladder", repo / "scripts/dtype_ladder.py"
            )
            dtype_ladder = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(dtype_ladder)
            dtype_ladder.main()
        except Exception as e:
            print(f"(dtype ladder skipped: {type(e).__name__}: {e})")
    start = lines.index("| game | solver | full_tree | rebel | net |")
    for line in lines[start : start + 2 + len(rows)]:
        print(line)


if __name__ == "__main__":
    main()
