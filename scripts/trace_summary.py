#!/usr/bin/env python
"""Summarize a jax.profiler trace: device duty cycle + top ops by time.

Input: the directory passed to ``bench.py --profile DIR`` (a
tensorboard profile run: ``DIR/plugins/profile/<run>/*.trace.json.gz``,
chrome-trace format).  Output: per device line, total traced wall,
busy time, duty cycle, and the top-N events by summed duration — the
evidence layer for results/KERNEL_TUNING.md's roofline claims (the
fused Pallas kernel appears as a single device event, so in-kernel
phase attribution comes from bench.py's --ablate runs; this tool
establishes how much of the wall the kernel actually owns vs gaps,
D2H syncs, and non-kernel ops).

Usage: python scripts/trace_summary.py /tmp/trace_dir [--top 15]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os


def load_trace(profile_dir: str) -> dict:
    pats = [
        os.path.join(profile_dir, "plugins/profile/*/*.trace.json.gz"),
        os.path.join(profile_dir, "*.trace.json.gz"),
        os.path.join(profile_dir, "plugins/profile/*/*.trace.json"),
    ]
    paths = [p for pat in pats for p in glob.glob(pat)]
    if not paths:
        raise SystemExit(f"no *.trace.json[.gz] under {profile_dir}")
    path = max(paths, key=os.path.getmtime)
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f), path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument(
        "--device-filter", default="",
        help="substring of the process/track name to restrict to "
        "(e.g. 'TPU' or 'TensorCore'); default: every non-python track",
    )
    args = ap.parse_args()

    trace, path = load_trace(args.profile_dir)
    events = trace.get("traceEvents", [])
    # Map pid -> process name, (pid, tid) -> thread name.
    pids = {}
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    print(f"trace: {path}")
    per_track = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pids.get(e["pid"], str(e["pid"]))
        tname = tids.get((e["pid"], e.get("tid")), "")
        track = f"{pname} / {tname}".strip(" /")
        if args.device_filter and args.device_filter.lower() not in track.lower():
            continue
        # Skip pure-host python/trace-viewer bookkeeping tracks unless
        # explicitly asked for: the device story is what matters here.
        if not args.device_filter and (
            "python" in track.lower() or "plugins" in track.lower()
        ):
            continue
        per_track[track].append(e)

    for track in sorted(per_track):
        evs = per_track[track]
        start = min(e["ts"] for e in evs)
        end = max(e["ts"] + e["dur"] for e in evs)
        wall = end - start
        # Busy time via interval union (events on one track can nest —
        # XLA modules contain ops — so summing durations double-counts).
        ivals = sorted((e["ts"], e["ts"] + e["dur"]) for e in evs)
        busy = 0.0
        cur_s, cur_e = ivals[0]
        for s, t in ivals[1:]:
            if s > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = s, t
            else:
                cur_e = max(cur_e, t)
        busy += cur_e - cur_s
        by_name = collections.Counter()
        counts = collections.Counter()
        for e in evs:
            by_name[e["name"]] += e["dur"]
            counts[e["name"]] += 1
        print(
            f"\n== {track}: wall {wall/1e6:.3f}s, busy {busy/1e6:.3f}s "
            f"(duty {100*busy/max(wall,1e-9):.1f}%), {len(evs)} events"
        )
        for name, dur in by_name.most_common(args.top):
            print(
                f"  {dur/1e6:9.4f}s  {100*dur/max(busy,1e-9):5.1f}%  "
                f"x{counts[name]:<6} {name[:100]}"
            )


if __name__ == "__main__":
    main()
