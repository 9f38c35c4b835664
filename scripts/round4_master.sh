#!/bin/bash
# Round-4 chip queue (VERDICT round 3, items 1-5), revision 3.
#
# Plan, in judge-impact order:
#   E1  1x6 cfr 1024-rep cell            [done 12:32 UTC]
#   T1  1x6 fp canonical retrain         [done 14:30 UTC: 1000 epochs x
#       25,600 examples, decrease_lr_every=400 x2 = the reference
#       schedule, /root/reference/conf/c02_selfplay/liars_sp.yaml:36-37]
#   E3  1x6 fp cell with the T1 net (supersedes the 0.1088 cell)
#   E2  2x3 fp 1024-rep cell with the round-2 epoch860 net
#   T2  2x3 cfr canonical retrain (canonical-schedule CFR study arm
#       AND the 2x3-cfr-cell upgrade)
#   E4  2x3 cfr cell with the T2 net
#   T3  1x4 cfr canonical retrain (cheap; densest exploit curve +
#       eval_mse for the CFR-stability diagnosis)
#   E5  1x4 cfr cell with the T3 net
#
# Revision-2 hardening (the 12:40 UTC incident: a stray second TPU
# client crashed the worker, the T1 attempt died at epoch 0, and the
# queue then burned an eval attempt on the epoch0 checkpoint):
#   - trainings run in PINNED exp dirs and retry with
#     --mode start_continue, resuming from the 10-epoch full-state
#     checkpoints instead of starting over (or giving up) on a crash;
#   - a net must have >= MIN_EVAL_EPOCH trained epochs to be worth a
#     1024-repeat eval — otherwise the eval is skipped loudly;
#   - evalcell skips cells whose completed output already exists, so
#     the whole queue is idempotent and restartable at any time.
# Revision 3: the four pending eval cells run --engine pallas (the
# fused kernel, hardware-proven by the self-play generator, equality
# pinned in tests) — the grid-engine cells were ~2h each and the
# remaining queue would have blown past the bench deadline.
set -u
cd /root/repo
LOG=/tmp/round4.log
echo "$$" > /tmp/round4_master.pid
note() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

# eval_mse is NOT in COMMON: each eval_net call runs fresh full-depth
# solves at every depth-{2,4} node, and on the big games (1x6/2x3 —
# full-size supertree lanes) the epoch-0 eval crashed the TPU worker
# twice before stats.py capped the lane memory.  Even capped it costs
# real wall-clock there, so only the cheap 1x4 study run (T3) pays for
# the curves the round asks for.
COMMON="exploit_every=100 max_epochs=1000 \
  selfplay.batch=2048 selfplay.engine=pallas \
  selfplay.net_compute_dtype=bf16 stall_timeout_s=1800"
MIN_EVAL_EPOCH=200
# Stop launching new steps near round end so the chip is free for the
# driver's bench run (steps in flight still finish their attempt).
DEADLINE_TS=$(date -u -d "23:15" +%s)
past_deadline() {
  if [ "$(date -u +%s)" -gt "$DEADLINE_TS" ]; then
    note "deadline reached; not launching further steps"
    return 0
  fi
  return 1
}

# The tunneled chip can drop a client's in-flight RPC after a hiccup
# (observed 10:24 and 10:55 UTC today: the client then sleeps forever
# at 0% CPU while fresh connections work fine).  Probe with a fresh
# client before every step, and give every step a retry loop — the
# streamed eval accumulator and the trainer's full-state checkpoints
# make a killed attempt resumable at small cost.
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

# Newest checkpoint of a pinned training dir (by epoch number).
netfor() {  # $1 exp dir
  ls "$1"/ckpt/epoch*.params 2>/dev/null \
    | sed 's/.*epoch\([0-9]*\)\.params/\1 &/' | sort -n | tail -1 \
    | cut -d' ' -f2
}
epoch_of() {  # $1 params path
  basename "$1" | sed 's/epoch\([0-9]*\)\.params/\1/'
}

train() {  # $1 name, $2 per-attempt timeout, $3 attempts, overrides...
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
    # Finished runs write result.json; a timeout (124) means the full
    # window was trained — both are success for our purposes.
    if [ -f "$exp/result.json" ] || [ "$rc" = 124 ]; then break; fi
  done
}

evalcell() {  # $1 cellname, $2 game, $3 solver, $4 net, $5 timeout, extra...
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
    note "SKIP eval $name: net $net has <$MIN_EVAL_EPOCH epochs (not protocol-worthy)"
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
    # Success = the completed output file exists (eval_all writes it
    # only after the full 1024 repeats).
    if [ -f "$out" ]; then break; fi
  done
  python scripts/protocol_table.py >> "$LOG" 2>&1
}

R=results/liars_sp

# E1 — completed 12:32 UTC (0.0224); the skip check documents it.
evalcell 1x6f_cfr 1x6 cfr \
  "$R/adhoc-c9e481c3-decrease_lr_every=150-env.num_faces=6-env.subgame_params.use/ckpt/epoch490.params" \
  3600 --max-chunk 128

# T1 + E3 — canonical 1x6 fp (T1 resumes from the epoch-100 ckpt the
# crashed eval_mse attempts left; ~6.6 s/epoch -> one 7200s window
# covers the remaining 900).  New out name: the old 0.1088 cell stays
# on disk; protocol_table keeps the newest equal-repeat eval per cell,
# so the retrained net's rerun supersedes it by mtime.
train 1x6fp 7200 2 env.num_faces=6
evalcell 1x6f_fp_r4 1x6 fp "$(netfor outputs/liars_sp/r4_1x6fp)" \
  3600 --max-chunk 128 --engine pallas

# E2 — 2x3 fp cell with the existing near-canonical epoch860 net
# (independent of T2, so it cannot be blocked by a training failure).
evalcell 2x3f_fp 2x3 fp \
  "$R/env.num_dice=2-env.num_faces=3-exploit_every=100-max_epochs=1000-selfplay.batch=-60727016/ckpt/epoch860.params" \
  3600 --max-chunk 128 --engine pallas

# T2 + E4 — canonical 2x3 cfr and its cell.
train 2x3cfr 7200 1 env.num_dice=2 env.num_faces=3 \
  env.subgame_params.use_cfr=true
evalcell 2x3f_cfr 2x3 cfr "$(netfor outputs/liars_sp/r4_2x3cfr)" \
  3600 --max-chunk 128 --engine pallas

# T3 + E5 — canonical 1x4 cfr (densest stability curve,
# exploit_every=50, and the ONLY run paying for eval_mse curves — the
# cheap game).  New out name for the same supersede-by-mtime reason.
train 1x4cfr 5400 1 env.subgame_params.use_cfr=true exploit_every=50 \
  eval_mse=true
evalcell 1x4f_cfr_r4 1x4 cfr "$(netfor outputs/liars_sp/r4_1x4cfr)" 2400 --engine pallas

note "round4 master queue complete"
touch /tmp/round4.done
