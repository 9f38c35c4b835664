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


def _log_env(log):
    """Startup environment/provenance logging, mirroring the reference's
    git-status + env dump at job start (heyhi/__init__.py:85-107): git
    SHA + dirty state, hostname, python/jax versions, and the visible
    device set — so any result directory can be traced back to the
    exact tree that produced it."""
    import os
    import platform
    import subprocess

    def _git(*argv):
        try:
            return subprocess.run(
                ["git", *argv], capture_output=True, text=True, timeout=10,
                cwd=pathlib.Path(__file__).resolve().parent,
            ).stdout.strip()
        except Exception:
            return "<unavailable>"

    sha = _git("rev-parse", "HEAD")
    dirty = _git("status", "--porcelain")
    log.info("Git SHA: %s%s", sha, " (dirty)" if dirty else "")
    if dirty:
        for line in dirty.splitlines()[:20]:
            log.info("  dirty: %s", line)
    log.info(
        "Host: %s | Python %s", platform.node(), platform.python_version()
    )
    for key in ("JAX_PLATFORMS", "XLA_FLAGS", "SLURM_JOB_ID"):
        if os.environ.get(key):
            log.info("Env %s=%s", key, os.environ[key])
    try:
        import jax

        log.info(
            "JAX %s | devices: %s", jax.__version__,
            [str(d) for d in jax.devices()],
        )
    except Exception as e:  # pragma: no cover - diagnostics only
        log.info("JAX device probe failed: %s", e)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--cfg", required=True)
    ap.add_argument("--adhoc", action="store_true")
    ap.add_argument(
        "--mode", default="gentle_start",
        choices=("gentle_start", "start_restart", "start_continue",
                 "restart", "dryrun", "kill", "submit", "cluster_status"),
    )
    ap.add_argument("--out_root", default="outputs")
    ap.add_argument(
        "--platform", default=None,
        help="force a jax platform (e.g. cpu); needed because this "
        "environment pins JAX_PLATFORMS via sitecustomize",
    )
    ap.add_argument(
        "--dist", default=None, metavar="COORD,N,I",
        help="(internal; appended by the launcher) join a "
        "jax.distributed runtime: coordinator address, process count, "
        "process id",
    )
    ap.add_argument(
        "--exp_dir", default=None,
        help="(internal) pin the experiment dir instead of deriving it "
        "from config + overrides (used for launched ranks)",
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
    launcher_cfg = cfg.pop("launcher", {}) or {}
    exp_dir = (
        pathlib.Path(args.exp_dir)
        if args.exp_dir
        else cfglib.exp_dir_for(
            args.cfg, args.overrides, args.out_root, adhoc=args.adhoc
        )
    )
    log.info("Config: %s", json.dumps(cfg))
    log.info("Experiment dir: %s", exp_dir)
    if args.mode not in ("kill", "submit", "cluster_status"):
        # Management modes never touch the device backend, so only
        # real runs get the persistent compile cache (and its /tmp
        # side effect).
        from rebel_tpu.utils.compile_cache import enable as \
            enable_compile_cache

        enable_compile_cache()
    if args.dist is None and args.mode not in (
        "kill", "submit", "cluster_status"
    ):
        # Launched ranks defer the device probe (jax.devices() must not
        # run before jax.distributed.initialize below); management
        # modes never touch the device backend at all.
        _log_env(log)

    if args.mode == "submit":
        # Managed-cluster submission (the heyhi/submitit role,
        # heyhi/__init__.py:361-406): render + apply a GKE JobSet /
        # xpk workload / gcloud queued-resource whose pods run this
        # experiment with --mode start_continue (resume-safe restarts).
        from rebel_tpu.parallel import cluster as clusterlib

        cl_cfg = clusterlib.config_from_dict(
            launcher_cfg.get("cluster", {}) or {}
        )
        record = clusterlib.submit(exp_dir, cl_cfg, args.cfg,
                                   args.overrides)
        log.info("Cluster submission: %s", json.dumps(record, indent=1))
        # The exp dir is derived from the override list, so status/kill
        # must pin it explicitly rather than re-deriving it from a
        # (possibly different) override set.
        log.info("status: python run.py --cfg %s --mode cluster_status "
                 "--exp_dir %s", args.cfg, exp_dir)
        log.info("cancel: python run.py --cfg %s --mode kill "
                 "--exp_dir %s", args.cfg, exp_dir)
        return 0

    if args.mode == "cluster_status":
        from rebel_tpu.parallel import cluster as clusterlib

        print(clusterlib.status(exp_dir))
        return 0

    if args.mode == "kill":
        # A cluster-submitted experiment is cancelled at the cluster
        # (the scancel analog), not by local PID — but only if the
        # submission actually went through; a dry-run cluster.json must
        # not shadow a local launch in the same exp dir.
        if (exp_dir / "cluster.json").exists():
            from rebel_tpu.parallel import cluster as clusterlib

            if json.loads(
                (exp_dir / "cluster.json").read_text()
            ).get("submitted"):
                ok = clusterlib.cancel(exp_dir)
                log.info("cluster cancel: %s",
                         "ok" if ok else "unavailable")
                return 0 if ok else 1
        if args.adhoc and not args.exp_dir:
            # --adhoc salts the dir name with the launch time, so a
            # fresh kill invocation can never re-derive the running
            # experiment's directory — fail loudly instead of "killing"
            # a directory that does not exist.
            raise SystemExit(
                "--mode kill cannot locate an --adhoc experiment "
                "(its dir name is time-salted); pass the printed "
                "directory explicitly via --exp_dir"
            )
        from rebel_tpu.parallel.launcher import kill_experiment

        kill_experiment(exp_dir)
        return 0

    is_child = args.dist is not None
    if is_child:
        # Launched rank: join the distributed runtime; the parent
        # already ran the experiment-dir state machine.
        from rebel_tpu.parallel.distributed import initialize

        coord, n, i = args.dist.rsplit(",", 2)
        initialize(coord, int(n), int(i))
        _log_env(log)
        # NB: every rank shares the SAME exp dir (resume state must be
        # identical across ranks or the SPMD loops diverge and deadlock
        # at the first collective); filesystem writes are master-gated
        # inside run_spmd.
    elif not cfglib.handle_dst(exp_dir, args.mode):
        log.info("Nothing to do (mode=%s)", args.mode)
        return 0

    num_processes = int(launcher_cfg.get("num_processes", 1) or 1)
    if num_processes > 1 and not is_child:
        # Parent: re-invoke this command once per process with --dist.
        from rebel_tpu.parallel.launcher import launch_local

        child_argv = [sys.argv[0] if argv is None else "run.py"]
        child_argv += ["--cfg", args.cfg, "--mode", "start_continue",
                       "--out_root", args.out_root,
                       "--exp_dir", str(exp_dir)]
        if args.platform:
            child_argv += ["--platform", args.platform]
        child_argv += args.overrides
        return launch_local(
            child_argv, num_processes, exp_dir,
            coordinator=launcher_cfg.get("coordinator"),
        )

    # Master-only filesystem writes: launched ranks share one exp dir,
    # and concurrent non-atomic write_text of the same file can expose
    # truncated content to readers.
    if not is_child:
        # Multi-host auto-detect (TPU pod / Slurm): joins the cluster
        # runtime so every host runs one SPMD program instead of N
        # independent trainers racing on the exp dir.  No-op (and no
        # backend touch) off-cluster.
        from rebel_tpu.parallel.distributed import initialize

        initialize()
    import jax

    dist_rank = (
        int(args.dist.rsplit(",", 1)[1]) if is_child
        else jax.process_index() if jax.process_count() > 1 else 0
    )
    if dist_rank == 0:
        (exp_dir / "config.json").write_text(json.dumps(cfg, indent=1))
        (exp_dir / "heartbeat").touch()

    if task == "selfplay":
        trainer_cfg = cfglib.cfg_to_trainer_config(cfg)
        from rebel_tpu.training.trainer import Trainer

        trainer = Trainer(trainer_cfg, out_dir=exp_dir)
        import jax

        if is_child or jax.process_count() > 1 or (
            launcher_cfg.get("spmd") and jax.device_count() > 1
        ):
            # SPMD path: sharded lanes + psum'd grads over every device
            # of every process (resume handled inside).
            t0 = time.time()
            state, metrics = trainer.run_spmd(
                resume=args.mode == "start_continue" or is_child,
                hands=int(launcher_cfg.get("hands", 1) or 1),
            )
            result = {
                "task": task,
                "epochs": len(metrics),
                "wall_s": time.time() - t0,
                "final": metrics[-1] if metrics else {},
                "processes": jax.process_count(),
                "devices": jax.device_count(),
            }
            if jax.process_index() == 0:
                (exp_dir / "result.json").write_text(
                    json.dumps(result, indent=1)
                )
            log.info("Result: %s", json.dumps(result)[:2000])
            return 0
        state = None
        if args.mode == "start_continue":
            # Fall back across checkpoints if the newest is unreadable
            # (e.g. the process was killed mid-write before atomic
            # writes existed).
            ckpts = sorted(
                (p for p in (exp_dir / "ckpt").glob("epoch*.ckpt")
                 if p.stem[5:].isdigit()),  # not epochN.spmd.ckpt
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
    # (heyhi/__init__.py:229-241); master-only, like every shared-dir
    # write (launched eval ranks would race otherwise).
    if dist_rank == 0:
        (exp_dir / "result.json").write_text(json.dumps(result, indent=1))
    log.info("Result: %s", json.dumps(result)[:2000])
    return 0


if __name__ == "__main__":
    sys.exit(main())
