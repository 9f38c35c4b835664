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
    seen = set()
    for root in args.roots:
        for metrics in sorted(pathlib.Path(root).rglob("metrics.jsonl")):
            if metrics.parent.name in seen:  # results/ mirrors outputs/
                continue
            cfg, rows = load_run(metrics.parent)
            if not rows or not is_cfr(cfg):
                continue
            # Only real-scale runs are informative (the canonical epoch
            # is 25,600 examples, liars_sp.yaml:37).
            if cfg.get("data", {}).get("train_epoch_size", 0) < 25600:
                continue
            seen.add(metrics.parent.name)
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
        "## Findings (round 4)",
        "",
        "The round-2/3 'CFR instability' — e.g. 1x4f single-sample",
        "exploitability 0.097@140 -> 0.313@200 under the canonical",
        "schedule — does **not** reproduce at the canonical 1000-epoch",
        "budget, and is explained by eval variance, not training",
        "degradation:",
        "",
        "1. **The canonical schedule works at full scale.**  r4_2x3cfr",
        "   (epoch 990, halve@400 x2): expl_avg 0.141@100 -> 0.055@900",
        "   with both halvings and no blowup; its 1024-repeat protocol",
        "   cell is 0.0151, 3-5x better than every decay@150 run's",
        "   in-training eval at any epoch.  r4_1x4cfr (dense evals every",
        "   50 epochs + eval_mse) shows the same shape.",
        "2. **Single/8-sample evals are upward-biased noise.**  Per the",
        "   repeat-convergence tables (PROTOCOL.md), a 1-sample eval of a",
        "   net whose 1024-repeat exploitability is 0.023 reads 0.19, and",
        "   an 8-sample eval 0.05-0.10; swings of +/-0.1 between",
        "   checkpoints are within sampling noise.  The old 'blowup'",
        "   points were 1-sample evals (expl_avg did not exist yet).",
        "3. **Net quality never degrades.**  r4_1x4cfr's eval_mse",
        "   (net-value vs fresh-BR-value MSE, the reference's own",
        "   net-quality metric) drops 0.465@0 -> ~0.0005 by epoch 150 and",
        "   stays there through both halvings — while the noisy",
        "   exploitability samples oscillate above it.  At the",
        "   1024-repeat protocol level (where the noise averages out) the",
        "   same run is *monotone*: old epoch-140 cell 0.0231 ->",
        "   epoch-550 0.0177 -> epoch-990 0.0076 (eval_1x4f_cfr_*.json).",
        "",
        "The decrease_lr_every=150 patch was therefore treating a",
        "measurement artifact; the reference schedule is the default",
        "going forward.",
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
