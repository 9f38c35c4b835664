#!/bin/bash
# Round-4 last slot: canonical 1x5 CFR retrain + cell, filling the
# free chip window before the bench deadline.  (1x6 CFR cannot reach a
# useful epoch in the remaining time; it stays a round-5 item.)
set -u
cd /root/repo
LOG=/tmp/round4.log
echo "$$" > /tmp/round4_last.pid
note() { echo "=== $(date -u +%H:%M:%S) [last] $*" | tee -a "$LOG"; }
DEADLINE_TS=$(date -u -d "23:10" +%s)
past_deadline() {
  [ "$(date -u +%s)" -gt "$DEADLINE_TS" ] && {
    note "deadline reached"; return 0; }
  return 1
}
waitchip() {
  local i
  for i in $(seq 1 10); do
    timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
y=(jnp.ones((128,128))@jnp.ones((128,128))).sum()
assert float(np.asarray(y)) == 128*128*128
" >/dev/null 2>&1 && return 0
    note "chip probe $i failed"; sleep 60
  done
  return 1
}
netfor() {
  ls "$1"/ckpt/epoch*.params 2>/dev/null \
    | sed 's/.*epoch\([0-9]*\)\.params/\1 &/' | sort -n | tail -1 \
    | cut -d' ' -f2
}

for attempt in 1 2; do
  past_deadline && exit 0
  waitchip || exit 1
  MODE=gentle_start
  [ -d outputs/liars_sp/r4_1x5cfr/ckpt ] && MODE=start_continue
  note "train 1x5cfr attempt $attempt (mode $MODE)"
  timeout 4200 python run.py --cfg conf/liars_sp.yaml \
    --exp_dir outputs/liars_sp/r4_1x5cfr --mode "$MODE" \
    exploit_every=200 max_epochs=1000 \
    selfplay.batch=2048 selfplay.engine=pallas \
    selfplay.net_compute_dtype=bf16 stall_timeout_s=1800 \
    env.num_faces=5 env.subgame_params.use_cfr=true \
    >> /tmp/r4_train_1x5cfr.log 2>&1
  rc=$?
  note "trained 1x5cfr attempt $attempt (exit $rc, last ckpt $(netfor outputs/liars_sp/r4_1x5cfr))"
  if [ -f outputs/liars_sp/r4_1x5cfr/result.json ] || [ "$rc" = 124 ]; then
    break
  fi
done

NET="$(netfor outputs/liars_sp/r4_1x5cfr)"
EP=$(basename "$NET" | sed 's/epoch\([0-9]*\)\.params/\1/')
if [ -n "$NET" ] && [ "$EP" -ge 600 ]; then
  for attempt in 1 2; do
    past_deadline && exit 0
    waitchip || exit 1
    note "eval 1x5f_cfr_r4 attempt $attempt (net $NET)"
    timeout 1800 python scripts/eval_all.py \
      --games 1x5 --solvers cfr --net "$NET" \
      --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 \
      --no-regrets --engine pallas \
      --out results/eval_1x5f_cfr_r4_1024rep.json --resume \
      >> /tmp/r4_eval_1x5f_cfr_r4.log 2>&1
    note "evaled 1x5f_cfr_r4 attempt $attempt (exit $?)"
    [ -f results/eval_1x5f_cfr_r4_1024rep.json ] && break
  done
  python scripts/protocol_table.py >> "$LOG" 2>&1
else
  note "1x5cfr net too shallow ($EP); keeping the old cell"
fi
note "round4 last slot complete"
touch /tmp/round4_last.done
