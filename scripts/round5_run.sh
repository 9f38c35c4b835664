#!/bin/bash
# Round-5 chip queue, v2 — supersedes round5_queue.sh, which was written
# at the end of round 4 against paths (outputs/liars_sp/r4_*) that did
# not survive the round boundary: the container reset wiped outputs/,
# and only the force-added protocol-cited epoch990.params files made it
# into git (results/POLICY.md).  Casualties:
#   - r4_1x5cfr (incl. the cited epoch930 net of the 0.0148 cell): LOST
#   - r4_1x4fp  (the canonical FP retrain + all its ckpts):        LOST
#   - every non-cited neighbor epoch of the surviving r4 runs:     LOST
# so "resume r4_1x5cfr" and "sweep r4 checkpoints" are impossible.
# This queue retrains those runs at the canonical schedule, writing the
# run dirs DIRECTLY under results/liars_sp/ (tracked provenance; params
# stay untracked until designation per results/POLICY.md).
#
# Steps, in judge-impact order (VERDICT round 4, items 3-8):
#   T1/E1  1x6 cfr canonical retrain + its 1024-rep cell (VERDICT #3)
#   T2/E2  1x5 cfr canonical retrain + cell (replaces the lost net)
#   T3/E3  1x4 fp  canonical retrain (dense evals + eval_mse) + cell
#   B1     bf16-bias cell: released 1x4 cfr net re-run on the fast
#          grid engine in f32, same seeds (VERDICT #4 / ADVICE medium)
#   D1     1x4 fp diagnosis curve: protocol cells at epochs
#          200/400/600/800 of T3 (VERDICT #6)
#   S*     checkpoint sweeps (final/-20/-40) for the three new runs —
#          the reference's EPOCHS=(980,1000,1020) convention
#          (/root/reference/scripts/eval_all.py:35) (VERDICT #5)
#   X1     stretch: 1x4 cfr retrain so that cell gets a sweep too
#
# Round-4 postmortem hardening (VERDICT #1a — the queue held the
# single-client TPU tunnel into the driver's bench window):
#   - DEADLINE:   no NEW step launches after it;
#   - HARD_STOP:  every step's timeout is capped to the time remaining
#     until it, so nothing started before the deadline can still be
#     running after the hard stop;
#   - last acts:  wait (reaps all children), then the sentinel file.
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
HARD_STOP_TS=$(date -u -d "10:10" +%s)
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
  for i in $(seq 1 30); do
    past_deadline && return 1
    if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
y=(jnp.ones((128,128))@jnp.ones((128,128))).sum()
assert float(np.asarray(y)) == 128*128*128
" >/dev/null 2>&1; then return 0; fi
    note "chip probe $i failed; waiting"
    sleep 60
  done
  note "chip unreachable after 30 probes"
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
  local exp="results/liars_sp/${name}" attempt mode rc capped
  [ -f "$exp/result.json" ] && { note "skip train $name: complete"; return 0; }
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
    if [ -f "$exp/result.json" ]; then break; fi
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

# Sweep helper: evaluate the run's final epoch plus the two 20-epoch
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
train r5_1x6cfr 7200 2 env.num_faces=6 env.subgame_params.use_cfr=true

# ---- E1: its headline cell (newest epoch = the likely citation) -------
NET16=$(netfor results/liars_sp/r5_1x6cfr)
if [ -n "$NET16" ]; then
  evalcell "1x6f_cfr_r5e$(epoch_of "$NET16")" 1x6 cfr "$NET16" 2700 \
    --max-chunk 128 --engine pallas
fi

# ---- T2: canonical 1x5 cfr (the r4 net + run are lost; full retrain) --
train r5_1x5cfr 6000 2 env.num_faces=5 env.subgame_params.use_cfr=true

NET15=$(netfor results/liars_sp/r5_1x5cfr)
if [ -n "$NET15" ]; then
  evalcell "1x5f_cfr_r5e$(epoch_of "$NET15")" 1x5 cfr "$NET15" 2400 \
    --max-chunk 128 --engine pallas
fi

# ---- T3: canonical 1x4 fp with dense evals (diagnosis run, VERDICT #6)
train r5_1x4fp 6000 2 exploit_every=50 eval_mse=true

NET14=$(netfor results/liars_sp/r5_1x4fp)
if [ -n "$NET14" ]; then
  evalcell "1x4f_fp_r5e$(epoch_of "$NET14")" 1x4 fp "$NET14" 1800 \
    --engine pallas
fi

# ---- B1: bf16-bias cell — released 1x4 cfr cell on the fast engine ----
evalcell 1x4f_cfr_r4fast 1x4 cfr \
  results/liars_sp/r4_1x4cfr/ckpt/epoch990.params 3600

# ---- D1: 1x4 fp diagnosis curve (VERDICT #6) --------------------------
for ep in 200 400 600 800; do
  evalcell "1x4f_fp_r5diag_e${ep}" 1x4 fp \
    "results/liars_sp/r5_1x4fp/ckpt/epoch${ep}.params" 1800 --engine pallas
done

# ---- S: checkpoint sweeps over the three new runs ---------------------
sweep 1x6f_cfr_r5 1x6 cfr results/liars_sp/r5_1x6cfr 2700 \
  --max-chunk 128 --engine pallas
sweep 1x5f_cfr_r5 1x5 cfr results/liars_sp/r5_1x5cfr 2400 \
  --max-chunk 128 --engine pallas
sweep 1x4f_fp_r5 1x4 fp results/liars_sp/r5_1x4fp 1800 --engine pallas

# ---- X1: stretch — 1x4 cfr retrain so the best cell gets a sweep too --
train r5_1x4cfr 6000 1 env.subgame_params.use_cfr=true
sweep 1x4f_cfr_r5 1x4 cfr results/liars_sp/r5_1x4cfr 1800 --engine pallas

# ---- Final: designate best-per-cell and regenerate the table ----------
python scripts/designate_best.py >> "$LOG" 2>&1 || true
python scripts/protocol_table.py >> "$LOG" 2>&1 || true

# ---- Last acts (VERDICT #1a): release the chip with certainty ---------
# wait() reaps every child this queue started; nothing launched here can
# outlive this line.  The CPU f64 eval runs in a separate session but is
# CPU-only (--platform cpu) and never touches the chip tunnel.
wait
note "round5 queue complete; chip released"
touch /tmp/round5_queue.done
