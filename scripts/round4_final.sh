#!/bin/bash
# Round-4 final queue: finish the canonical 1x4 CFR study run (T3 was
# cut at epoch 550 by a transient remote-compile failure mid-eval) and
# supersede its protocol cell with the full epoch-1000 net.  Runs
# strictly after the bonus queue (round4_extra.done).
set -u
cd /root/repo
LOG=/tmp/round4.log
echo "$$" > /tmp/round4_final.pid
note() { echo "=== $(date -u +%H:%M:%S) [final] $*" | tee -a "$LOG"; }

DEADLINE_TS=$(date -u -d "23:15" +%s)
past_deadline() {
  if [ "$(date -u +%s)" -gt "$DEADLINE_TS" ]; then
    note "deadline reached; not launching further steps"
    return 0
  fi
  return 1
}

while [ ! -f /tmp/round4_extra.done ]; do
  past_deadline && exit 0
  EP=$(cat /tmp/round4_extra.pid 2>/dev/null || echo 0)
  if ! kill -0 "$EP" 2>/dev/null; then
    if ! ps -eo args | grep -E "^python (run\.py|scripts/eval_all\.py) " \
        | grep -qv grep; then
      note "extra queue dead and no chip children; proceeding"
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
  return 1
}

netfor() {
  ls "$1"/ckpt/epoch*.params 2>/dev/null \
    | sed 's/.*epoch\([0-9]*\)\.params/\1 &/' | sort -n | tail -1 \
    | cut -d' ' -f2
}

# Resume T3 to epoch 1000 (same canonical config incl. eval_mse).
for attempt in 1 2; do
  past_deadline && exit 0
  waitchip || exit 1
  note "train 1x4cfr resume attempt $attempt"
  timeout 3600 python run.py --cfg conf/liars_sp.yaml \
    --exp_dir outputs/liars_sp/r4_1x4cfr --mode start_continue \
    exploit_every=50 eval_mse=true max_epochs=1000 \
    selfplay.batch=2048 selfplay.engine=pallas \
    selfplay.net_compute_dtype=bf16 stall_timeout_s=1800 \
    env.subgame_params.use_cfr=true \
    >> /tmp/r4_train_1x4cfr.log 2>&1
  rc=$?
  note "trained 1x4cfr resume attempt $attempt (exit $rc, last ckpt $(netfor outputs/liars_sp/r4_1x4cfr))"
  if [ -f outputs/liars_sp/r4_1x4cfr/result.json ] || [ "$rc" = 124 ]; then
    break
  fi
done

NET="$(netfor outputs/liars_sp/r4_1x4cfr)"
EP=$(basename "$NET" | sed 's/epoch\([0-9]*\)\.params/\1/')
if [ "$EP" -ge 900 ]; then
  for attempt in 1 2; do
    past_deadline && exit 0
    waitchip || exit 1
    note "eval 1x4f_cfr_r4b attempt $attempt (net $NET)"
    timeout 2400 python scripts/eval_all.py \
      --games 1x4 --solvers cfr --net "$NET" \
      --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 \
      --no-regrets --engine pallas \
      --out results/eval_1x4f_cfr_r4b_1024rep.json --resume \
      >> /tmp/r4_eval_1x4f_cfr_r4.log 2>&1
    note "evaled 1x4f_cfr_r4b attempt $attempt (exit $?)"
    [ -f results/eval_1x4f_cfr_r4b_1024rep.json ] && break
  done
  python scripts/protocol_table.py >> "$LOG" 2>&1
else
  note "resume did not reach epoch 900 (at $EP); keeping the r4 cell"
fi

note "round4 final queue complete"
touch /tmp/round4_final.done
