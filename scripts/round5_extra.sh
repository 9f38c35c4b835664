#!/bin/bash
# Round-5 follow-up chip work, gated on the main queue's sentinel.
#
# Motivated by the B1 finding (see results/PROTOCOL.md engine/dtype
# ladder): the same 1x4 cfr epoch-990 net evaluates to 0.0076 under
# the production pallas engine (bf16 MLP) but ~0.022 under fast-f32
# AND fast-f64 (reference math) — the bf16 path's per-iteration noise
# decorrelates the sampled repeats and the reach-weighted average gets
# measurably less exploitable.  One game is an anecdote; this script
# adds fast-engine rungs for the other cited cfr/fp cells so the
# ladder shows whether the effect is systematic.
#
# Same deadline discipline as round5_run.sh: DEADLINE gates new
# launches, HARD_STOP caps every timeout, so the chip is free well
# before the driver's bench window.
set -u
cd /root/repo
LOG=/tmp/round5_extra.log
echo "$$" > /tmp/round5_extra.pid
note() { echo "=== $(date -u +%H:%M:%S) [r5x] $*" | tee -a "$LOG"; }

DEADLINE_TS=$(date -u -d "09:20" +%s)
HARD_STOP_TS=$(date -u -d "10:10" +%s)
past_deadline() { [ "$(date -u +%s)" -gt "$DEADLINE_TS" ]; }
capto() {
  local remain=$(( HARD_STOP_TS - $(date -u +%s) ))
  if [ "$remain" -lt "$1" ]; then echo "$remain"; else echo "$1"; fi
}

# Wait for the main queue to finish (sentinel) — never share the chip.
while [ ! -f /tmp/round5_queue.done ]; do
  past_deadline && { note "deadline before main queue finished"; exit 0; }
  sleep 60
done
note "main queue done; starting extra rungs"

# First act: the profile capture for KERNEL_TUNING.md (VERDICT #8) —
# cheap (~5 min), and doing it first guarantees it happens even if the
# eval rungs eat the rest of the window.
if [ ! -d /tmp/r5_trace ]; then
  note "bench --profile capture"
  timeout "$(capto 900)" python bench.py --headline-only \
    --profile /tmp/r5_trace >> "$LOG" 2>&1
  note "profile capture done (exit $?)"
fi

evalcell() {  # $1 cellname, $2 game, $3 solver, $4 net, $5 timeout, extra...
  local name="$1" game="$2" solver="$3" net="$4" to="$5"; shift 5
  local out="results/eval_${name}_1024rep.json" attempt rc capped
  [ -f "$out" ] && { note "skip $name: complete"; return 0; }
  [ -f "$net" ] || { note "SKIP $name: net missing"; return 1; }
  for attempt in 1 2; do
    past_deadline && return 1
    capped=$(capto "$to")
    [ "$capped" -lt 300 ] && { note "no window for $name"; return 1; }
    note "eval $name attempt $attempt (timeout $capped)"
    timeout "$capped" python scripts/eval_all.py \
      --games "$game" --solvers "$solver" --net "$net" \
      --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 --no-regrets \
      --out "$out" --resume "$@" >> "/tmp/r5x_${name}.log" 2>&1
    rc=$?
    note "evaled $name attempt $attempt (exit $rc)"
    [ -f "$out" ] && break
  done
  [ -f "$out" ]
}

# Fast-engine (f32) rungs for cited cells, cheapest first.
evalcell 1x4f_fp_r5fast 1x4 fp \
  results/liars_sp/r5_1x4fp/ckpt/epoch990.params 2400
evalcell 1x5f_cfr_r5fast 1x5 cfr \
  results/liars_sp/r5_1x5cfr/ckpt/epoch990.params 3600
evalcell 2x3f_cfr_r4fast 2x3 cfr \
  results/liars_sp/r4_2x3cfr/ckpt/epoch990.params 4800 --max-chunk 128
evalcell 1x6f_cfr_r5fast 1x6 cfr \
  results/liars_sp/r5_1x6cfr/ckpt/epoch990.params 4800 --max-chunk 128

python scripts/designate_best.py >> "$LOG" 2>&1 || true
python scripts/protocol_table.py >> "$LOG" 2>&1 || true
wait
note "round5 extra complete; chip released"
touch /tmp/round5_extra.done
