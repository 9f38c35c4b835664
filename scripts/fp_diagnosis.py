#!/usr/bin/env python
"""Assemble the 1x4 FP regression diagnosis (VERDICT round-4 #6).

Question: why did the canonical 1000-epoch FP retrain (epoch990,
protocol cell 0.0437 in round 4) lose to a 40-epoch-schedule net
(epoch180, 0.0343) on the smallest game — when every CFR cell improved
under the canonical budget?

Evidence assembled here, following the CFR_STABILITY.md playbook:

1. the canonical r5 retrain's in-training curves (1-sample recursive
   exploitability + eval_net MSE vs best-response values, the
   reference's ``stats.cc`` diagnostic) from metrics.jsonl;
2. protocol-level cells (1024 iters x 1024 repeats) at epochs
   200/400/600/800/final of the same run — the D1 sweep;
3. the surviving round-4 records for the short-schedule epoch180 net
   and the r4 canonical epoch990 net.

Writes results/FP_1X4.md (tables + whatever conclusions block already
exists in the file is preserved under the CONCLUSIONS marker).

Usage: python scripts/fp_diagnosis.py
"""

from __future__ import annotations

import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
RUN = REPO / "results/liars_sp/r5_1x4fp"
OUT = REPO / "results/FP_1X4.md"
CONCL = "## Conclusions"


def load_cells():
    rows = []
    for path in sorted(REPO.glob("results/eval_1x4f_fp*_1024rep.json")):
        try:
            recs = json.loads(path.read_text())
        except Exception:
            continue
        for rec in recs if isinstance(recs, list) else [recs]:
            reps = rec.get("sampled_reports") or []
            if not reps:
                continue
            net = rec.get("net") or ""
            m = re.search(r"epoch(\d+)\.params", net)
            rows.append(
                {
                    "file": path.name,
                    "net": net,
                    "epoch": int(m.group(1)) if m else -1,
                    "run": pathlib.Path(net).parent.parent.name,
                    "rebel": rec.get("rebel"),
                    "reps": reps[-1]["repeats"],
                }
            )
    return rows


def main() -> None:
    lines = [
        "# The 1x4 FP regression — canonical budget vs short schedule",
        "",
        "Round 4 found the only cell where the canonical 1000-epoch",
        "schedule *hurt*: 1x4 fp scored 0.0437 at epoch990 vs the",
        "40-epoch-schedule net's 0.0343 at epoch180 (both complete",
        "1024-repeat cells).  Every CFR cell improved 2-3x under the",
        "same budget.  This file is the diagnosis record (VERDICT",
        "round-4 #6), built by scripts/fp_diagnosis.py from the r5",
        "canonical retrain (results/liars_sp/r5_1x4fp: dense in-training",
        "evals + eval_mse) and protocol-level cells at epochs",
        "200/400/600/800/final.",
        "",
        "## In-training curves (r5_1x4fp, canonical schedule)",
        "",
        "`exploitability_last/avg` = 1-sample recursive eval every 50",
        "epochs (noisy — CFR_STABILITY.md); `eval_mse/*` = net MSE vs",
        "fresh best-response values over the most-reachable depth-2/4",
        "nodes (the reference's stats.cc diagnostic), beliefs from",
        "net-induced and FP-uniform reach.",
        "",
        "| epoch | exploit_last | exploit_avg | mse net_reach | mse fp_reach | lr |",
        "|---|---|---|---|---|---|",
    ]
    mpath = RUN / "metrics.jsonl"
    if mpath.exists():
        for row in map(json.loads, mpath.open()):
            if "exploitability_last" not in row:
                continue
            lines.append(
                f"| {row['epoch']} | {row['exploitability_last']:.4f} "
                f"| {row['exploitability_avg']:.4f} "
                f"| {row.get('eval_mse/net_reach', float('nan')):.5f} "
                f"| {row.get('eval_mse/fp_reach', float('nan')):.5f} "
                f"| {row.get('optim/lr', float('nan')):.1e} |"
            )
    else:
        lines.append("| (run not available yet) | | | | | |")
    lines += [
        "",
        "## Protocol-level cells (1024 iters x 1024 repeats)",
        "",
        "| run | epoch | rebel exploitability | reps | file |",
        "|---|---|---|---|---|",
    ]
    for r in sorted(load_cells(), key=lambda r: (r["run"], r["epoch"])):
        lines.append(
            f"| {r['run']} | {r['epoch']} | {r['rebel']:.4f} "
            f"| {r['reps']} | {r['file']} |"
        )
    lines.append("")

    prior = ""
    if OUT.exists() and CONCL in OUT.read_text():
        prior = OUT.read_text()
        prior = prior[prior.index(CONCL):]
    OUT.write_text("\n".join(lines) + "\n" + prior)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
