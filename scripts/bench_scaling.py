#!/usr/bin/env python
"""Linear-scaling benchmark: self-play generation + training throughput
at 1, 2, 4, ... devices of the current runtime (BASELINE.md north-star:
linear env-steps/s scaling at 1 chip / 1 host / 2+ hosts).

On a real pod slice this measures true ICI-scaling; on a dev box use the
virtual CPU mesh to validate the scaling *structure*:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/bench_scaling.py --platform cpu --devices 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=None)
    ap.add_argument("--lanes-per-device", type=int, default=256)
    ap.add_argument("--num-iters", type=int, default=128)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rebel_tpu.parallel.mesh import make_mesh, make_spmd_programs
    from rebel_tpu.selfplay.runner import RecursiveSolvingParams
    from rebel_tpu.solving.params import SubgameSolvingParams
    from rebel_tpu.training.trainer import Trainer, TrainerConfig

    n_avail = len(jax.devices())
    dev_counts = args.devices or [
        d for d in (1, 2, 4, 8, 16, 32) if d <= n_avail
    ]

    rows = []
    for n in dev_counts:
        cfg = TrainerConfig(
            env=RecursiveSolvingParams(
                num_dice=1,
                num_faces=4,
                subgame_params=SubgameSolvingParams(
                    num_iters=args.num_iters, max_depth=2,
                    linear_update=True, use_cfr=True,
                ),
                random_action_prob=0.25,
                sample_leaf=True,
            ),
            n_hidden=256,
            n_layers=2,
            selfplay_batch=args.lanes_per_device * n,
            train_batch_size=64 * n,
            train_epoch_size=64 * n,
            replay_capacity=args.lanes_per_device * n * 64,
            solver_dtype=jnp.float32,
        )
        trainer = Trainer(cfg)
        mesh = make_mesh(n)
        init_state, gen_step, train_step = make_spmd_programs(trainer, mesh)
        st = init_state(seed=0)
        params, opt_state = st.params, st.opt_state
        episodes, replay, keys = st.episodes, st.replay, st.keys
        # Warmup (compile).
        episodes, replay, keys = gen_step(params, episodes, replay, keys)
        params, opt_state, keys, stats = train_step(
            params, opt_state, replay, keys
        )
        float(np.asarray(stats["loss"]))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            episodes, replay, keys = gen_step(params, episodes, replay, keys)
            params, opt_state, keys, stats = train_step(
                params, opt_state, replay, keys
            )
        chk = float(np.asarray(stats["loss"]))
        dt = time.perf_counter() - t0
        subgames = cfg.selfplay_batch * args.steps
        rows.append(
            {
                "devices": n,
                "subgames_per_s": subgames / dt,
                "cfr_iters_per_s": subgames * args.num_iters / dt,
                "examples_per_s": 2 * subgames / dt,
                "loss": chk,
            }
        )
        print(
            f"devices={n:3d}  {rows[-1]['cfr_iters_per_s'] / 1e6:8.2f}M "
            f"iters/s  {rows[-1]['examples_per_s']:9.1f} examples/s",
            flush=True,
        )

    base = rows[0]["cfr_iters_per_s"] / rows[0]["devices"]
    for r in rows:
        r["scaling_efficiency"] = r["cfr_iters_per_s"] / (
            base * r["devices"]
        )
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
