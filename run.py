#!/usr/bin/env python
"""CLI entry point, mirroring the reference's run.py
(/root/reference/run.py:103-109): ``-c/--cfg`` config, ``--adhoc``,
``--mode``, plus free-form dotted ``key=value`` overrides.

Examples:

    python run.py --adhoc --cfg conf/liars_sp.yaml env.num_dice=1 \
        env.num_faces=4 env.subgame_params.use_cfr=true
    python run.py --cfg conf/liars_sp.yaml --mode start_continue
"""

from __future__ import annotations

import argparse
import json
import logging
import pathlib
import sys
import time


def setup_logging():
    # Single-letter level formatter (heyhi/__init__.py:57-82).
    logging.basicConfig(
        level=logging.INFO,
        format="%(levelname).1s%(asctime)s [%(name)s] %(message)s",
        datefmt="%m%d %H:%M:%S",
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--cfg", required=True)
    ap.add_argument("--adhoc", action="store_true")
    ap.add_argument(
        "--mode", default="gentle_start",
        choices=("gentle_start", "start_restart", "start_continue",
                 "restart", "dryrun"),
    )
    ap.add_argument("--out_root", default="outputs")
    ap.add_argument(
        "--platform", default=None,
        help="force a jax platform (e.g. cpu); needed because this "
        "environment pins JAX_PLATFORMS via sitecustomize",
    )
    ap.add_argument("overrides", nargs="*", help="dotted key=value")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    setup_logging()
    log = logging.getLogger("run")

    from rebel_tpu import config as cfglib

    cfg = cfglib.load_yaml_config(args.cfg)
    cfg = cfglib.apply_overrides(cfg, args.overrides)
    task = cfg.pop("task", "selfplay")
    exp_dir = cfglib.exp_dir_for(
        args.cfg, args.overrides, args.out_root, adhoc=args.adhoc
    )
    log.info("Config: %s", json.dumps(cfg))
    log.info("Experiment dir: %s", exp_dir)
    if not cfglib.handle_dst(exp_dir, args.mode):
        log.info("Nothing to do (mode=%s)", args.mode)
        return 0

    (exp_dir / "config.json").write_text(json.dumps(cfg, indent=1))
    heartbeat = exp_dir / "heartbeat"
    heartbeat.touch()

    if task == "selfplay":
        trainer_cfg = cfglib.cfg_to_trainer_config(cfg)
        from rebel_tpu.training.trainer import Trainer

        trainer = Trainer(trainer_cfg, out_dir=exp_dir)
        state = None
        if args.mode == "start_continue":
            # Fall back across checkpoints if the newest is unreadable
            # (e.g. the process was killed mid-write before atomic
            # writes existed).
            ckpts = sorted(
                (exp_dir / "ckpt").glob("epoch*.ckpt"),
                key=lambda p: int(p.stem[5:]),
                reverse=True,
            ) if (exp_dir / "ckpt").exists() else []
            for ckpt in ckpts:
                try:
                    state = trainer.load_checkpoint(str(ckpt))
                    log.info("Resuming from %s", ckpt)
                    break
                except Exception as e:
                    log.warning("Unreadable checkpoint %s (%s); trying "
                                "older", ckpt, e)
        t0 = time.time()
        state, metrics = trainer.run(state)
        result = {
            "task": task,
            "epochs": int(state.epoch),
            "wall_s": time.time() - t0,
            "final": metrics[-1] if metrics else {},
        }
    elif task == "eval":
        from rebel_tpu.eval.recursive_eval import run_eval_from_config

        result = run_eval_from_config(cfg, exp_dir)
    else:
        raise ValueError(f"Unknown task: {task}")

    # result.json plays the role of result.torch
    # (heyhi/__init__.py:229-241).
    (exp_dir / "result.json").write_text(json.dumps(result, indent=1))
    log.info("Result: %s", json.dumps(result)[:2000])
    return 0


if __name__ == "__main__":
    sys.exit(main())
