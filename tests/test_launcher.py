"""Multi-process launcher tests (the heyhi/submitit role,
/root/reference/heyhi/__init__.py:333-406).

Covers: a real 2-process ``jax.distributed`` SPMD run driven end-to-end
through the ``run.py`` CLI, and the PID-safety contract of ``--mode
kill`` (never signal a PID whose command line no longer matches what the
launcher recorded).
"""
import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_launch_local_two_process_spmd(tmp_path):
    cmd = [
        sys.executable, str(REPO / "run.py"),
        "--cfg", str(REPO / "conf" / "liars_sp.yaml"),
        "--platform", "cpu", "--adhoc", "--out_root", str(tmp_path),
        "launcher.num_processes=2", "launcher.spmd=true",
        "max_epochs=1", "exploit=false",
        "data.train_batch_size=16", "data.train_epoch_size=16",
        "replay.capacity=1024", "selfplay.batch=8",
        "env.num_faces=2", "env.subgame_params.num_iters=16",
    ]
    # The suite's conftest sets XLA_FLAGS=--xla_force_host_platform_
    # device_count=8 for in-process mesh tests; the launched children
    # must see one CPU device each (1 local / 2 global), as on a pod.
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    proc = subprocess.run(
        cmd, cwd=REPO, capture_output=True, text=True, timeout=600, env=env
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    results = list(tmp_path.glob("*/*/result.json"))
    assert len(results) == 1, (proc.stdout[-1000:], proc.stderr[-1000:])
    result = json.loads(results[0].read_text())
    assert result["processes"] == 2
    assert result["devices"] == 2
    assert result["epochs"] == 1
    # Per-rank logs with rank 0 mirrored to the parent (heyhi's
    # master-only logging): rank 1 gets a log file.
    exp_dir = results[0].parent
    assert (exp_dir / "log.rank1.txt").exists()
    # jobs.json is removed once the group exits.
    assert not (exp_dir / "jobs.json").exists()


def test_kill_experiment_ignores_recycled_pids(tmp_path):
    from rebel_tpu.parallel.launcher import kill_experiment

    # A jobs.json whose recorded argv does not match the live process
    # under that PID (simulating PID recycling) must kill nothing.
    jobs = {
        "coordinator": "127.0.0.1:1",
        "procs": [{"pid": 1, "rank": 0, "argv": ["definitely-not-init"]}],
    }
    (tmp_path / "jobs.json").write_text(json.dumps(jobs))
    assert kill_experiment(tmp_path) == 0


def test_kill_experiment_signals_recorded_pids(tmp_path):
    from rebel_tpu.parallel.launcher import kill_experiment

    argv = [sys.executable, "-c", "import time; time.sleep(60)"]
    p = subprocess.Popen(argv)
    try:
        jobs = {
            "coordinator": "127.0.0.1:1",
            "procs": [{"pid": p.pid, "rank": 0, "argv": argv}],
        }
        (tmp_path / "jobs.json").write_text(json.dumps(jobs))
        assert kill_experiment(tmp_path) == 1
        deadline = time.time() + 10
        while p.poll() is None and time.time() < deadline:
            time.sleep(0.1)
        assert p.poll() is not None
        assert not (tmp_path / "jobs.json").exists()
    finally:
        if p.poll() is None:
            p.kill()


def test_kill_experiment_no_jobs_file(tmp_path):
    from rebel_tpu.parallel.launcher import kill_experiment

    assert kill_experiment(tmp_path) == 0
