#!/usr/bin/env python
"""CFR-training-stability study: exploitability / LR / eval_mse curves.

Round-2/3 observed CFR exploitability *degrading* with training at
constant LR (1x4f cfr 0.097@140 -> 0.313@200, results/SUMMARY.md) and
patched the symptom with `decrease_lr_every=150`.  The reference trains
with halving every 400 epochs inside a 10,000-epoch budget
(/root/reference/conf/c02_selfplay/liars_sp.yaml:36-37 + adam.yaml) and
its released checkpoints are from epoch ~1000, i.e. after both
halvings.  This script lines up every CFR run's
epoch -> (lr, train loss, exploitability_last/avg, eval_mse/*) so the
canonical-schedule round-4 runs can be compared directly against the
short-budget and decay@150 arms, and writes results/CFR_STABILITY.md.

Usage: python scripts/cfr_stability.py [--roots results outputs]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def load_run(run: pathlib.Path):
    cfg = {}
    cfg_path = run / "config.json"
    if cfg_path.exists():
        cfg = json.loads(cfg_path.read_text())
    rows = [
        json.loads(l)
        for l in (run / "metrics.jsonl").read_text().splitlines()
        if l.strip()
    ]
    return cfg, rows


def is_cfr(cfg) -> bool:
    return bool(
        cfg.get("env", {}).get("subgame_params", {}).get("use_cfr", False)
    )


def game_of(cfg) -> str:
    env = cfg.get("env", {})
    return f"{env.get('num_dice', 1)}x{env.get('num_faces', '?')}f"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="+", default=["results", "outputs"])
    ap.add_argument("--out", default="results/CFR_STABILITY.md")
    args = ap.parse_args()

    runs = []
    for root in args.roots:
        for metrics in sorted(pathlib.Path(root).rglob("metrics.jsonl")):
            cfg, rows = load_run(metrics.parent)
            if not rows or not is_cfr(cfg):
                continue
            # Only real-scale runs are informative (the canonical epoch
            # is 25,600 examples, liars_sp.yaml:37).
            if cfg.get("data", {}).get("train_epoch_size", 0) < 25600:
                continue
            runs.append((metrics.parent, cfg, rows))

    lines = [
        "# CFR training stability across LR schedules",
        "",
        "Every CFR run at the canonical epoch size (25,600 examples),",
        "epoch vs LR / train loss / in-training exploitability",
        "(`exploitability_avg` = 8-repeat averaged recursive-to-leaf,",
        "`exploitability_last` = single sample) / `eval_mse/*` net-quality",
        "MSE where recorded.  Reference schedule: halve LR every 400",
        "epochs, twice (liars_sp.yaml:36-37); round-2/3 protocol runs",
        "used decrease_lr_every=150 as a stability patch.",
        "",
    ]
    for run, cfg, rows in runs:
        sched = (
            f"lr {cfg.get('optimizer', {}).get('kwargs', {}).get('lr', '?')}"
            f" halve@{cfg.get('decrease_lr_every')}"
            f" x{cfg.get('decrease_lr_times')}"
        )
        lines.append(
            f"## {game_of(cfg)} — {run.name[:68]}"
        )
        lines.append("")
        lines.append(
            f"schedule: {sched}; max_epochs {cfg.get('max_epochs')}; "
            f"selfplay batch "
            f"{(cfg.get('selfplay') or {}).get('batch')}; "
            f"epochs completed {rows[-1]['epoch'] + 1}"
        )
        lines.append("")
        evals = [
            r for r in rows
            if "exploitability_last" in r or "exploitability_avg" in r
        ]
        if not evals:
            lines.append("(no in-training exploitability evals)")
            lines.append("")
            continue
        has_mse = any("eval_mse/net_reach" in r for r in evals)
        hdr = "| epoch | lr | loss | expl_avg | expl_last |"
        sep = "|---|---|---|---|---|"
        if has_mse:
            hdr += " mse_net_reach | mse_fp_reach |"
            sep += "---|---|"
        lines += [hdr, sep]

        def f(v, n=4):
            return f"{v:.{n}f}" if isinstance(v, (int, float)) else "—"

        for r in evals:
            row = (
                f"| {r['epoch']} | {r.get('optim/lr', float('nan')):.1e} "
                f"| {f(r.get('loss/train'))} "
                f"| {f(r.get('exploitability_avg'))} "
                f"| {f(r.get('exploitability_last'))} |"
            )
            if has_mse:
                row += (
                    f" {f(r.get('eval_mse/net_reach'), 5)} "
                    f"| {f(r.get('eval_mse/fp_reach'), 5)} |"
                )
            lines.append(row)
        lines.append("")

    pathlib.Path(args.out).write_text("\n".join(lines) + "\n")
    print(f"wrote {args.out} ({len(runs)} CFR runs)")


if __name__ == "__main__":
    main()
