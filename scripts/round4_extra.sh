#!/bin/bash
# Round-4 bonus queue: canonical retrains for the remaining weak FP
# cells.  The 1x6 fp story (epoch-60 net LOSES to the unaided
# full-tree solve; epoch-1000 canonical net beats it ~1.7x) applies
# verbatim to the other FP cells still backed by short-budget nets:
#   1x5 fp cell 0.0482 vs full-tree 0.0217  (epoch90 net,  100-epoch run)
#   1x4 fp cell 0.0343 vs full-tree 0.0099  (epoch180 net,  short run)
# T4/E6: canonical 1x5 fp retrain + cell.  T5/E7: canonical 1x4 fp.
#
# Runs strictly AFTER the main queue: waits for /tmp/round4.done (the
# master's last act), with a liveness fallback if the master died.
# Same library of steps as round4_master.sh.
set -u
cd /root/repo
LOG=/tmp/round4.log
echo "$$" > /tmp/round4_extra.pid
note() { echo "=== $(date -u +%H:%M:%S) [extra] $*" | tee -a "$LOG"; }

# exploit_every=200: these runs' deliverable is the 1024-rep protocol
# cell, not dense curves — and in-training evals on the grid engine
# cost minutes each (17 min/eval observed on 2x3).
COMMON="exploit_every=200 max_epochs=1000 \
  selfplay.batch=2048 selfplay.engine=pallas \
  selfplay.net_compute_dtype=bf16 stall_timeout_s=1800"
MIN_EVAL_EPOCH=200
DEADLINE_TS=$(date -u -d "23:15" +%s)
past_deadline() {
  if [ "$(date -u +%s)" -gt "$DEADLINE_TS" ]; then
    note "deadline reached; not launching further steps"
    return 0
  fi
  return 1
}

# Wait for the main queue: done-file, or master dead with no chip
# children left (covers a master crash mid-queue).
while [ ! -f /tmp/round4.done ]; do
  past_deadline && exit 0
  MP=$(cat /tmp/round4_master.pid 2>/dev/null || echo 0)
  if ! kill -0 "$MP" 2>/dev/null; then
    # master gone: make sure no orphaned chip client is still running
    # (detection only — nothing is ever killed by pattern)
    if ! ps -eo args | grep -E "^python (run\.py|scripts/eval_all\.py) " \
        | grep -qv grep; then
      note "master dead and no chip children; proceeding"
      break
    fi
  fi
  sleep 120
done

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

netfor() {
  ls "$1"/ckpt/epoch*.params 2>/dev/null \
    | sed 's/.*epoch\([0-9]*\)\.params/\1 &/' | sort -n | tail -1 \
    | cut -d' ' -f2
}
epoch_of() { basename "$1" | sed 's/epoch\([0-9]*\)\.params/\1/'; }

train() {
  local name="$1" to="$2" tries="$3"; shift 3
  local exp="outputs/liars_sp/r4_${name}" attempt mode rc
  for attempt in $(seq 1 "$tries"); do
    past_deadline && return 1
    waitchip || return 1
    mode=gentle_start
    [ -d "$exp/ckpt" ] && mode=start_continue
    note "train $name attempt $attempt (mode $mode): $*"
    timeout "$to" python run.py --cfg conf/liars_sp.yaml \
      --exp_dir "$exp" --mode "$mode" $COMMON "$@" \
      >> "/tmp/r4_train_${name}.log" 2>&1
    rc=$?
    note "trained $name attempt $attempt (exit $rc, last ckpt $(netfor "$exp"))"
    if [ -f "$exp/result.json" ] || [ "$rc" = 124 ]; then break; fi
  done
}

evalcell() {
  local name="$1" game="$2" solver="$3" net="$4" to="$5"; shift 5
  local out="results/eval_${name}_1024rep.json" attempt rc
  if [ -f "$out" ]; then
    note "skip eval $name: $out already complete"
    return 0
  fi
  if [ -z "$net" ] || [ ! -f "$net" ]; then
    note "SKIP eval $name: net '$net' missing"; return 1
  fi
  if [ "$(epoch_of "$net")" -lt "$MIN_EVAL_EPOCH" ]; then
    note "SKIP eval $name: net $net has <$MIN_EVAL_EPOCH epochs"
    return 1
  fi
  for attempt in 1 2 3; do
    past_deadline && return 1
    waitchip || return 1
    note "eval $name attempt $attempt (net $net)"
    timeout "$to" python scripts/eval_all.py \
      --games "$game" --solvers "$solver" --net "$net" \
      --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 --no-regrets \
      --out "$out" --resume "$@" \
      >> "/tmp/r4_eval_${name}.log" 2>&1
    rc=$?
    note "evaled $name attempt $attempt (exit $rc)"
    if [ -f "$out" ]; then break; fi
  done
  python scripts/protocol_table.py >> "$LOG" 2>&1
}

# T4 + E6 — canonical 1x5 fp.
train 1x5fp 7200 2 env.num_faces=5
evalcell 1x5f_fp_r4 1x5 fp "$(netfor outputs/liars_sp/r4_1x5fp)" \
  2400 --max-chunk 128 --engine pallas

# T5 + E7 — canonical 1x4 fp.
train 1x4fp 5400 2
evalcell 1x4f_fp_r4 1x4 fp "$(netfor outputs/liars_sp/r4_1x4fp)" \
  2400 --engine pallas

note "round4 extra queue complete"
touch /tmp/round4_extra.done
