#!/bin/bash
# Round-3 canonical-scale training queue (VERDICT item 1): retrain every
# protocol net at the reference's released-checkpoint regime — 25,600
# examples/epoch, 1000 epochs, LR halving at 400/800 (the canonical
# decrease_lr_every=400 x2 schedule, conf/liars_sp.yaml) — serialized on
# the single TPU chip. Each run is adhoc; logs under /tmp/queue_*.log.
set -u
cd /root/repo
# exploit_every=250: the 8-repeat averaged in-training eval is chip
# time the queue can't spare x10 per run; the 1024-repeat protocol eval
# after the queue is the headline anyway.
COMMON="exploit_every=250 max_epochs=1000 selfplay.batch=2048 \
  selfplay.engine=pallas selfplay.net_compute_dtype=bf16 \
  stall_timeout_s=1800"

run() {
  local name="$1"; shift
  echo "=== $(date -u +%H:%M:%S) queue: $name ==="
  timeout 7200 python run.py --adhoc --cfg conf/liars_sp.yaml $COMMON "$@" \
    > "/tmp/queue_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done: $name (exit $?) ==="
}

run 1x6cfr env.num_faces=6 env.subgame_params.use_cfr=true
run 1x5cfr env.num_faces=5 env.subgame_params.use_cfr=true
run 1x5fp  env.num_faces=5
run 1x4cfr env.num_faces=4 env.subgame_params.use_cfr=true
run 1x4fp  env.num_faces=4
# 2x3f CFR canonical schedule at canonical budget (VERDICT item 7's
# study arm; the decay@150 arm exists from round 2 at 729 epochs).
run 2x3cfr env.num_dice=2 env.num_faces=3 env.subgame_params.use_cfr=true
echo "=== queue complete ==="
