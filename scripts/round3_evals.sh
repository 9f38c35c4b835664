#!/bin/bash
# Round-3 protocol eval sweep: all 8 cells at 1024 subgame-iters x 1024
# repeats (the reference's released-checkpoint protocol,
# /root/reference/scripts/eval_all.py:33-44,61-104) against the round-3
# canonical-scale nets (resolved from each run dir's config.json).
# Run AFTER scripts/round3_queue.sh drains.
# Usage: round3_evals.sh [cells...]  (default: all)
set -u
cd /root/repo

find_net() {  # $1 num_dice, $2 num_faces, $3 use_cfr(true/false)
  python - "$1" "$2" "$3" <<'EOF'
import json, pathlib, sys
nd, nf, cfr = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3] == "true"
best = None
for cfgp in pathlib.Path("outputs/liars_sp").glob("*/config.json"):
    try:
        cfg = json.load(open(cfgp))
    except Exception:
        continue
    env = cfg.get("env", {})
    if env.get("num_dice", 1) != nd or env.get("num_faces") != nf:
        continue
    if bool(env.get("subgame_params", {}).get("use_cfr", False)) != cfr:
        continue
    if cfg.get("max_epochs") != 1000:
        continue
    ckpts = sorted(
        cfgp.parent.glob("ckpt/epoch*.params"),
        key=lambda p: int(p.stem[5:]),
    )
    if not ckpts:
        continue
    cand = (int(ckpts[-1].stem[5:]), cfgp.stat().st_mtime, ckpts[-1])
    if best is None or cand[:2] > best[:2]:
        best = cand
print(best[2] if best else "")
EOF
}

evalcell() {  # $1 name, $2 game, $3 solver, $4 net-params path
  local name="$1" game="$2" solver="$3" net="$4"
  if [ -z "$net" ]; then echo "!!! $name: no net found"; return 1; fi
  echo "=== $(date -u +%H:%M:%S) eval $name (net $net) ==="
  timeout 5400 python scripts/eval_all.py \
    --games "$game" --solvers "$solver" --net "$net" \
    --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 --no-regrets \
    --out "results/eval_r3_${name}.json" \
    > "/tmp/eval_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $name (exit $?) ==="
}

want() { local c="$1"; shift; [ $# -eq 0 ] || [[ " $* " == *" $c "* ]]; }
CELLS=("${@:-}")

want 1x6fp  ${CELLS[@]:-} && evalcell 1x6fp  1x6 fp  "$(find_net 1 6 false)"
want 1x6cfr ${CELLS[@]:-} && evalcell 1x6cfr 1x6 cfr "$(find_net 1 6 true)"
want 1x5cfr ${CELLS[@]:-} && evalcell 1x5cfr 1x5 cfr "$(find_net 1 5 true)"
want 1x5fp  ${CELLS[@]:-} && evalcell 1x5fp  1x5 fp  "$(find_net 1 5 false)"
want 1x4cfr ${CELLS[@]:-} && evalcell 1x4cfr 1x4 cfr "$(find_net 1 4 true)"
want 1x4fp  ${CELLS[@]:-} && evalcell 1x4fp  1x4 fp  "$(find_net 1 4 false)"
want 2x3cfr ${CELLS[@]:-} && evalcell 2x3cfr 2x3 cfr "$(find_net 2 3 true)"
# 2x3f FP keeps the round-2 870-epoch net (near-canonical; paper-shaped
# result already) — retraining it is not in the round-3 queue.
want 2x3fp  ${CELLS[@]:-} && evalcell 2x3fp  2x3 fp  "results/liars_sp/env.num_dice=2-env.num_faces=3-exploit_every=100-max_epochs=1000-selfplay.batch=-60727016/ckpt/epoch860.params"
echo "=== eval sweep complete ==="
