#!/usr/bin/env python
"""Summarize training runs under results/ into results/SUMMARY.md:
per-run config, loss/exploitability trajectories, throughput."""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def summarize(root: str = "results") -> str:
    out = ["# Training runs\n"]
    for metrics in sorted(pathlib.Path(root).rglob("metrics.jsonl")):
        run = metrics.parent
        lines = [json.loads(l) for l in metrics.read_text().splitlines()]
        if not lines:
            continue
        cfg = {}
        cfg_path = run / "config.json"
        if cfg_path.exists():
            cfg = json.loads(cfg_path.read_text())
        env = cfg.get("env", {})
        sp = env.get("subgame_params", {})
        solver = "cfr" if sp.get("use_cfr") else "fp"
        game = f"{env.get('num_dice', '?')}x{env.get('num_faces', '?')}f"
        last = lines[-1]
        out.append(f"## {run.name}\n")
        out.append(
            f"- game **{game}**, solver **{solver}**, "
            f"num_iters {sp.get('num_iters')}, "
            f"epoch size {cfg.get('data', {}).get('train_epoch_size')}, "
            f"epochs completed **{last['epoch'] + 1}**"
        )
        out.append(
            f"- final train loss {last['loss/train']:.5f}; "
            f"gen {last.get('bps/gen_examples', 0):.0f} examples/s; "
            f"buffer {last.get('buffer/added', 0)} examples generated"
        )
        expl = [
            (l["epoch"], l["exploitability_last"])
            for l in lines
            if "exploitability_last" in l
        ]
        if expl:
            traj = ", ".join(f"{e}: {v:.4f}" for e, v in expl)
            out.append(
                "- recursive-to-leaf exploitability (single sample, "
                f"epoch: value): {traj}"
            )
        out.append("")
    return "\n".join(out)


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "results"
    text = summarize(root)
    path = pathlib.Path(root) / "SUMMARY.md"
    path.write_text(text)
    print(text)
    print(f"written: {path}")
