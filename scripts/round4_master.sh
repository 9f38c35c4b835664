#!/bin/bash
# Round-4 chip queue (VERDICT round 3, items 1-5): one sequential script
# (no cross-script wait loops — the round-3 sentinel hazard is gone by
# construction), each step stamped into /tmp/round4.log.
#
# Plan, in judge-impact order:
#   E1  resume the 1x6 cfr 1024-rep eval from its 256-rep accumulator
#       (same epoch490 net — the accumulator's strategies are that
#       net's, so resuming under any other net would be wrong)
#   T1  1x6 fp canonical retrain: 1000 epochs x 25,600 examples,
#       decrease_lr_every=400 x2 (the conf/liars_sp.yaml defaults =
#       /root/reference/conf/c02_selfplay/liars_sp.yaml:36-37),
#       eval_mse on (selfplay.py:568-570)
#   E3  1x6 fp cell rerun with the T1 net (supersedes the 0.1088 cell)
#   T2  2x3 cfr canonical retrain (same schedule; the canonical-schedule
#       CFR study arm AND the 2x3-cfr-cell upgrade)
#   E2  2x3 fp 1024-rep cell with the round-2 epoch860 net
#   E4  2x3 cfr cell with the T2 net
#   T3  1x4 cfr canonical retrain (cheap; densest exploit curve for the
#       CFR-stability diagnosis — the documented 0.097@140 -> 0.313@200
#       blowup run used the same schedule at shorter budget)
#   E5  1x4 cfr cell rerun with the T3 net
#
# protocol_table.py regenerates results/PROTOCOL.md after every step;
# repeat-count ties break by mtime so each retrained net's eval
# supersedes its old cell.
set -u
cd /root/repo
LOG=/tmp/round4.log
echo "$$" > /tmp/round4_master.pid
note() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

COMMON="exploit_every=100 eval_mse=true max_epochs=1000 \
  selfplay.batch=2048 selfplay.engine=pallas \
  selfplay.net_compute_dtype=bf16 stall_timeout_s=1800"

# The tunneled chip can drop a client's in-flight RPC after a hiccup
# (observed 10:24 and 10:55 UTC today: the client then sleeps forever
# at 0% CPU while fresh connections work fine).  Probe with a fresh
# client before every step, and give evals retry loops — the streamed
# accumulator makes a killed eval resumable at ~3 min cost.
waitchip() {
  local i
  for i in $(seq 1 90); do
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
y=(jnp.ones((128,128))@jnp.ones((128,128))).sum()
assert float(np.asarray(y)) == 128*128*128
" >/dev/null 2>&1; then return 0; fi
    note "chip probe $i failed; waiting"
    sleep 60
  done
  note "chip unreachable after 90 probes"
  return 1
}

# Newest (by exp-dir mtime — a cut-short fresh run must not lose to a
# stale deeper run, round-3 advisor finding) run matching the cell, its
# last epoch*.params. Logs the chosen exp dir so mislabeled evals are
# detectable.
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
    cand = (cfgp.stat().st_mtime, int(ckpts[-1].stem[5:]), ckpts[-1])
    if best is None or cand[:2] > best[:2]:
        best = cand
if best:
    print(f"chose {best[2].parent.parent}", file=sys.stderr)
    print(best[2])
EOF
}

train() {  # $1 name, $2 timeout, train overrides...
  local name="$1" to="$2"; shift 2
  waitchip || return 1
  note "train $name: $*"
  timeout "$to" python run.py --adhoc --cfg conf/liars_sp.yaml \
    $COMMON "$@" > "/tmp/r4_train_${name}.log" 2>&1
  note "trained $name (exit $?)"
}

evalcell() {  # $1 cellname, $2 game, $3 solver, $4 net, $5 timeout, extra...
  local name="$1" game="$2" solver="$3" net="$4" to="$5"; shift 5
  if [ -z "$net" ] || [ ! -f "$net" ]; then
    note "SKIP eval $name: net '$net' missing"; return 1
  fi
  local out="results/eval_${name}_1024rep.json" attempt rc
  for attempt in 1 2 3 4; do
    waitchip || return 1
    note "eval $name attempt $attempt (net $net)"
    timeout "$to" python scripts/eval_all.py \
      --games "$game" --solvers "$solver" --net "$net" \
      --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 --no-regrets \
      --out "$out" --resume "$@" \
      >> "/tmp/r4_eval_${name}.log" 2>&1
    rc=$?
    note "evaled $name attempt $attempt (exit $rc)"
    # Success = the completed output file exists (eval_all writes it
    # only after the full 1024 repeats).
    if [ -f "$out" ]; then break; fi
  done
  python scripts/protocol_table.py >> "$LOG" 2>&1
}

R=results/liars_sp

# Per-attempt timeouts are modest on purpose: the streamed accumulator
# makes a killed attempt resumable, so a wedged client costs at most
# one timeout, not the cell.

# E1 — finish the 1x6 cfr cell (repeats resume from the accumulator).
evalcell 1x6f_cfr 1x6 cfr \
  "$R/adhoc-c9e481c3-decrease_lr_every=150-env.num_faces=6-env.subgame_params.use/ckpt/epoch490.params" \
  3600 --max-chunk 128

# T1 + E3 — canonical 1x6 fp.
train 1x6fp 7200 env.num_faces=6
NET16FP="$(find_net 1 6 false)"
evalcell 1x6f_fp 1x6 fp "$NET16FP" 3600 --max-chunk 128

# T2 + E4 prep — canonical 2x3 cfr.
train 2x3cfr 7200 env.num_dice=2 env.num_faces=3 \
  env.subgame_params.use_cfr=true

# E2 — 2x3 fp cell with the existing near-canonical epoch860 net.
evalcell 2x3f_fp 2x3 fp \
  "$R/env.num_dice=2-env.num_faces=3-exploit_every=100-max_epochs=1000-selfplay.batch=-60727016/ckpt/epoch860.params" \
  3600 --max-chunk 128

# E4 — 2x3 cfr cell with the canonical net.
NET23CFR="$(find_net 2 3 true)"
evalcell 2x3f_cfr 2x3 cfr "$NET23CFR" 3600 --max-chunk 128

# T3 + E5 — canonical 1x4 cfr (densest stability curve, exploit_every=50).
train 1x4cfr 5400 env.subgame_params.use_cfr=true exploit_every=50
NET14CFR="$(find_net 1 4 true)"
evalcell 1x4f_cfr 1x4 cfr "$NET14CFR" 2400

note "round4 master queue complete"
touch /tmp/round4.done
