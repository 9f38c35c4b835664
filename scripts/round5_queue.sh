#!/bin/bash
# Round-5 chip queue (VERDICT round 4, items 3-8), in judge-impact order:
#
#   T1  1x6 cfr canonical retrain (the last non-canonical CFR cell;
#       VERDICT #3) — 1000 epochs x 25,600, halve@400/800
#   E1  1x6 cfr cell with the T1 net (supersedes the 0.0224
#       decay@150/epoch490 cell)
#   T2  resume r4_1x5cfr 930 -> 1000 (cheap; enables its epoch sweep)
#   B1  bf16-bias cell: the released 1x4 cfr cell (r4b, epoch990,
#       pallas-bf16) re-run on the fast grid engine in f32, same
#       net/seeds (VERDICT #4 / ADVICE medium).  With the CPU f64 run
#       launched alongside this queue, the cell gets a full
#       pallas-bf16 vs fast-f32 vs fast-f64 dtype ladder.
#   S*  multi-epoch checkpoint sweeps per canonical run (VERDICT #5,
#       the reference's EPOCHS=(980,1000,1020) convention,
#       /root/reference/scripts/eval_all.py:35): two more epochs
#       beside each released cell, best-of designated at the end.
#   D1  1x4 fp diagnosis curve (VERDICT #6): protocol-level cells at
#       epochs 200/400/600/800 of the canonical FP retrain to see
#       WHERE it falls behind the epoch-180 short-schedule net.
#
# Round-4 postmortem hardening (VERDICT #1a — the queue held the
# single-client TPU tunnel into the driver's bench window):
#   - DEADLINE:   no NEW step launches after it;
#   - HARD_STOP:  every step's timeout is capped to the time remaining
#     until it, so nothing started before the deadline can still be
#     running after the hard stop;
#   - last acts:  wait, then an orphan-client check (kill by exact
#     recorded PID only), then the sentinel file.
set -u
cd /root/repo
LOG=/tmp/round5.log
echo "$$" > /tmp/round5_queue.pid
note() { echo "=== $(date -u +%H:%M:%S) [r5] $*" | tee -a "$LOG"; }

COMMON="exploit_every=200 max_epochs=1000 \
  selfplay.batch=2048 selfplay.engine=pallas \
  selfplay.net_compute_dtype=bf16 stall_timeout_s=1800"
MIN_EVAL_EPOCH=200
DEADLINE_TS=$(date -u -d "09:20" +%s)
HARD_STOP_TS=$(date -u -d "10:15" +%s)
past_deadline() {
  if [ "$(date -u +%s)" -gt "$DEADLINE_TS" ]; then
    note "deadline reached; not launching further steps"
    return 0
  fi
  return 1
}
# Cap a step's timeout to the window remaining before HARD_STOP.
capto() {  # $1 wanted timeout -> echoes min(wanted, remaining)
  local remain=$(( HARD_STOP_TS - $(date -u +%s) ))
  if [ "$remain" -lt "$1" ]; then echo "$remain"; else echo "$1"; fi
}

waitchip() {
  local i
  for i in $(seq 1 60); do
    past_deadline && return 1
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
y=(jnp.ones((128,128))@jnp.ones((128,128))).sum()
assert float(np.asarray(y)) == 128*128*128
" >/dev/null 2>&1; then return 0; fi
    note "chip probe $i failed; waiting"
    sleep 60
  done
  note "chip unreachable after 60 probes"
  return 1
}

netfor() {  # newest checkpoint of an exp dir
  ls "$1"/ckpt/epoch*.params 2>/dev/null \
    | sed 's/.*epoch\([0-9]*\)\.params/\1 &/' | sort -n | tail -1 \
    | cut -d' ' -f2
}
epoch_of() { basename "$1" | sed 's/epoch\([0-9]*\)\.params/\1/'; }

train() {  # $1 exp name, $2 per-attempt timeout, $3 attempts, overrides...
  local name="$1" to="$2" tries="$3"; shift 3
  local exp="outputs/liars_sp/${name}" attempt mode rc capped
  for attempt in $(seq 1 "$tries"); do
    past_deadline && return 1
    waitchip || return 1
    mode=gentle_start
    [ -d "$exp/ckpt" ] && mode=start_continue
    capped=$(capto "$to")
    [ "$capped" -lt 300 ] && { note "no window left for train $name"; return 1; }
    note "train $name attempt $attempt (mode $mode, timeout $capped): $*"
    timeout "$capped" python run.py --cfg conf/liars_sp.yaml \
      --exp_dir "$exp" --mode "$mode" $COMMON "$@" \
      >> "/tmp/r5_train_${name}.log" 2>&1
    rc=$?
    note "trained $name attempt $attempt (exit $rc, last ckpt $(netfor "$exp"))"
    if [ -f "$exp/result.json" ] || [ "$rc" = 124 ]; then break; fi
  done
}

evalcell() {  # $1 cellname, $2 game, $3 solver, $4 net, $5 timeout, extra...
  local name="$1" game="$2" solver="$3" net="$4" to="$5"; shift 5
  local out="results/eval_${name}_1024rep.json" attempt rc capped
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
    capped=$(capto "$to")
    [ "$capped" -lt 300 ] && { note "no window left for eval $name"; return 1; }
    note "eval $name attempt $attempt (net $net, timeout $capped)"
    timeout "$capped" python scripts/eval_all.py \
      --games "$game" --solvers "$solver" --net "$net" \
      --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 --no-regrets \
      --out "$out" --resume "$@" \
      >> "/tmp/r5_eval_${name}.log" 2>&1
    rc=$?
    note "evaled $name attempt $attempt (exit $rc)"
    if [ -f "$out" ]; then break; fi
  done
  [ -f "$out" ]
}

# Sweep helper: evaluate the run's released epoch plus the two 20-epoch
# neighbors below it (the reference's multi-checkpoint convention).
sweep() {  # $1 cell prefix, $2 game, $3 solver, $4 exp dir, $5 timeout, extra...
  local prefix="$1" game="$2" solver="$3" exp="$4" to="$5"; shift 5
  local last ep net
  last=$(netfor "$exp") || return 1
  [ -z "$last" ] && { note "SKIP sweep $prefix: no ckpts in $exp"; return 1; }
  for ep in $(( $(epoch_of "$last") )) \
            $(( $(epoch_of "$last") - 20 )) \
            $(( $(epoch_of "$last") - 40 )); do
    net="$exp/ckpt/epoch${ep}.params"
    [ -f "$net" ] || { note "sweep $prefix: no epoch$ep"; continue; }
    evalcell "${prefix}e${ep}" "$game" "$solver" "$net" "$to" "$@"
  done
}

# ---- T1: canonical 1x6 cfr --------------------------------------------
train r5_1x6cfr 6900 2 env.num_faces=6 env.subgame_params.use_cfr=true

# ---- E1: its headline cell (newest epoch first — the likely citation)
NET16=$(netfor outputs/liars_sp/r5_1x6cfr)
if [ -n "$NET16" ]; then
  evalcell "1x6f_cfr_r5e$(epoch_of "$NET16")" 1x6 cfr "$NET16" 2700 \
    --max-chunk 128 --engine pallas
fi

# ---- T2: finish r4_1x5cfr to epoch 1000 (resumes epoch930.ckpt) -------
train r4_1x5cfr 2400 2 env.num_faces=5 env.subgame_params.use_cfr=true

# ---- B1: bf16-bias cell — released 1x4 cfr cell on the fast engine ----
evalcell 1x4f_cfr_r4fast 1x4 cfr \
  outputs/liars_sp/r4_1x4cfr/ckpt/epoch990.params 3300

# ---- E: 1x5 cfr at its new final epoch --------------------------------
NET15=$(netfor outputs/liars_sp/r4_1x5cfr)
if [ -n "$NET15" ] && [ "$(epoch_of "$NET15")" -gt 930 ]; then
  evalcell "1x5f_cfr_r5e$(epoch_of "$NET15")" 1x5 cfr "$NET15" 2400 \
    --max-chunk 128 --engine pallas
fi

# ---- S: checkpoint sweeps (skip-complete makes these idempotent; the
# released-epoch cell is re-requested and skipped if already present) --
sweep 1x6f_cfr_r5 1x6 cfr outputs/liars_sp/r5_1x6cfr 2700 \
  --max-chunk 128 --engine pallas
sweep 1x5f_cfr_r5 1x5 cfr outputs/liars_sp/r4_1x5cfr 2400 \
  --max-chunk 128 --engine pallas
sweep 1x4f_cfr_r5 1x4 cfr outputs/liars_sp/r4_1x4cfr 1500 --engine pallas
sweep 1x4f_fp_r5 1x4 fp outputs/liars_sp/r4_1x4fp 1500 --engine pallas

# ---- D1: 1x4 fp diagnosis curve (VERDICT #6) --------------------------
for ep in 200 400 600 800; do
  evalcell "1x4f_fp_r5diag_e${ep}" 1x4 fp \
    "outputs/liars_sp/r4_1x4fp/ckpt/epoch${ep}.params" 1500 --engine pallas
done

sweep 1x5f_fp_r5 1x5 fp outputs/liars_sp/r4_1x5fp 2400 \
  --max-chunk 128 --engine pallas
sweep 1x6f_fp_r5 1x6 fp outputs/liars_sp/r4_1x6fp 2700 \
  --max-chunk 128 --engine pallas
# 2x3 evals are the most expensive; one extra epoch each, last.
evalcell 2x3f_cfr_r5e970 2x3 cfr \
  outputs/liars_sp/r4_2x3cfr/ckpt/epoch970.params 3600 \
  --max-chunk 128 --engine pallas
evalcell 2x3f_fp_r5e840 2x3 fp \
  "results/liars_sp/env.num_dice=2-env.num_faces=3-exploit_every=100-max_epochs=1000-selfplay.batch=-60727016/ckpt/epoch840.params" \
  3600 --max-chunk 128 --engine pallas

# ---- Final: designate best-per-cell and regenerate the table ----------
python scripts/designate_best.py >> "$LOG" 2>&1 || true
python scripts/protocol_table.py >> "$LOG" 2>&1 || true

# ---- Last acts (VERDICT #1a): release the chip with certainty ---------
# Orphan check: any TPU-client process this queue started would be a
# child; wait() reaps them.  Then verify no recorded-PID process from
# this round's scripts is still alive (exact PIDs only — never kill by
# pattern), and write the sentinel the session watches for.
wait
for pf in /tmp/round5_queue.pid; do :; done
if [ -f /tmp/r5/f64.pid ]; then
  fpid=$(cat /tmp/r5/f64.pid)
  if kill -0 "$fpid" 2>/dev/null; then
    note "orphan check: CPU f64 eval (pid $fpid) still running — CPU-only, not a chip client; leaving it"
  fi
fi
note "round5 queue complete; chip released"
touch /tmp/round5_queue.done
