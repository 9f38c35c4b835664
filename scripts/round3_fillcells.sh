#!/bin/bash
# Round-3 step 1: complete the protocol matrix's missing/partial cells
# (VERDICT round 2, item 1) using the round-2 nets restored from git
# history (commit 09097cf untracked them and the round boundary wiped
# the blobs; they are now force-added per results/POLICY.md).
#
# Cells: 1x5 cfr (never evaluated), 1x6 cfr (256-rep partial),
# 2x3 cfr (64-rep partial), 2x3 fp (256 reps). The streamed .acc.npz
# accumulators of the round-2 partials were not committed, so these are
# fresh 1024-repeat runs, not resumes. Retrained canonical nets from
# scripts/round3_queue.sh supersede these cells by mtime
# (scripts/protocol_table.py).
set -u
cd /root/repo
R=results/liars_sp

cell() {  # $1 name, $2 game, $3 solver, $4 net, extra args...
  local name="$1" game="$2" solver="$3" net="$4"; shift 4
  echo "=== $(date -u +%H:%M:%S) fill $name (net $net) ==="
  timeout 5400 python scripts/eval_all.py \
    --games "$game" --solvers "$solver" --net "$net" \
    --subgame-iters 1024 --num-repeats 1024 --mdp-depth 2 --no-regrets \
    --out "results/eval_${name}_1024rep.json" "$@" \
    > "/tmp/fill_${name}.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) done $name (exit $?) ==="
}

cell 1x5f_cfr 1x5 cfr "$R/decrease_lr_every=150-env.num_faces=5-env.subgame_params.use_cfr=true-exploit_ev-ce166b2a/ckpt/epoch380.params"
cell 1x6f_cfr 1x6 cfr "$R/adhoc-c9e481c3-decrease_lr_every=150-env.num_faces=6-env.subgame_params.use/ckpt/epoch490.params" --max-chunk 128
cell 2x3f_cfr 2x3 cfr "$R/decrease_lr_every=150-env.num_dice=2-env.num_faces=3-env.subgame_params.use_cfr=-f019d730/ckpt/epoch720.params" --max-chunk 128
cell 2x3f_fp  2x3 fp  "$R/env.num_dice=2-env.num_faces=3-exploit_every=100-max_epochs=1000-selfplay.batch=-60727016/ckpt/epoch860.params" --max-chunk 128
python scripts/protocol_table.py
echo "=== fill sweep complete ==="
# Completion sentinel for anything sequencing after this sweep (the
# chip is single-client): waiters watch this file, not the log text —
# the log only exists if the invoker happened to redirect stdout.
touch /tmp/fillcells.done
