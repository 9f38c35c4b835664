"""Multi-process launcher — the heyhi/submitit role, TPU-native.

The reference launches cluster jobs through submitit/Slurm with an
experiment-dir state machine (/root/reference/heyhi/__init__.py:333-406)
and a ``kill`` mode backed by ``scancel``
(/root/reference/heyhi/__init__.py:192-222).  Here the unit of
parallelism is a *process group forming one jax.distributed runtime*
(one process per host on a TPU pod; N local processes for CPU-mesh
testing), not independent ranks: every process joins the same SPMD
program via ``jax.distributed.initialize``.

``launch_local`` spawns N copies of the current command with per-process
``--dist coordinator,N,i`` flags and records exact PIDs in
``<exp_dir>/jobs.json`` (the ``heyhi.jobid`` analog) so ``kill`` can
signal precisely the processes it started — never by name or pattern.
On a multi-host TPU pod the same state machine applies with one launched
process per host (set ``launcher.coordinator`` to host 0's address).
"""

from __future__ import annotations

import json
import logging
import os
import pathlib
import signal
import socket
import subprocess
import sys
import time

log = logging.getLogger(__name__)

JOBS_FILE = "jobs.json"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch_local(
    child_argv: list[str],
    num_processes: int,
    exp_dir: pathlib.Path,
    coordinator: str | None = None,
) -> int:
    """Spawn ``num_processes`` children of ``child_argv`` (argv *after*
    the interpreter), each with ``--dist host:port,N,i`` appended, and
    wait.  Returns the first nonzero child exit code (0 on success).

    Ranks 1..N-1's stdout/stderr go to ``<exp_dir>/log.rank<i>.txt``;
    rank 0 streams to the parent's own stdout/stderr (mirroring heyhi's
    master-only logging — capture the parent to keep rank 0's log)."""
    exp_dir = pathlib.Path(exp_dir)
    exp_dir.mkdir(parents=True, exist_ok=True)
    coordinator = coordinator or f"127.0.0.1:{_free_port()}"
    procs: list[subprocess.Popen] = []
    jobs = {"coordinator": coordinator, "procs": []}
    try:
        for i in range(num_processes):
            argv = [sys.executable] + child_argv + [
                "--dist", f"{coordinator},{num_processes},{i}"
            ]
            logf = open(exp_dir / f"log.rank{i}.txt", "ab") if i else None
            try:
                p = subprocess.Popen(
                    argv,
                    stdout=logf,
                    stderr=logf,
                    start_new_session=True,
                )
            finally:
                if logf is not None:
                    # The child holds its own duplicated fd.
                    logf.close()
            procs.append(p)
            jobs["procs"].append({"pid": p.pid, "rank": i, "argv": argv})
        (exp_dir / JOBS_FILE).write_text(json.dumps(jobs, indent=1))
        log.info(
            "launched %d processes (coordinator %s); pids %s",
            num_processes, coordinator, [p.pid for p in procs],
        )
        rc = 0
        while procs:
            for p in list(procs):
                ret = p.poll()
                if ret is None:
                    continue
                procs.remove(p)
                if ret != 0:
                    rc = rc or ret
                    log.error("child pid %d exited rc=%d; stopping group",
                              p.pid, ret)
                    _kill_procs([q.pid for q in procs])
            time.sleep(0.5)
        return rc
    except BaseException:
        # Any failure — interrupt, a Popen/open OSError mid-spawn, an
        # unexpected bug — must not leave already-spawned children
        # orphaned in jax.distributed.initialize waiting for peers that
        # will never join (their PIDs are only persisted to jobs.json
        # after the full spawn loop, so kill mode couldn't find them).
        _kill_procs([p.pid for p in procs])
        raise
    finally:
        try:
            (exp_dir / JOBS_FILE).unlink()
        except OSError:
            pass


def _pid_matches(pid: int, argv: list[str]) -> bool:
    """Only signal a PID whose /proc cmdline still matches what we
    recorded — a recycled PID must never be killed."""
    if not argv:
        # No recorded command line -> nothing to match against; an
        # empty prefix would match ANY process, inverting the guard.
        return False
    try:
        cmd = pathlib.Path(f"/proc/{pid}/cmdline").read_bytes()
    except OSError:
        return False
    parts = [c for c in cmd.decode(errors="replace").split("\0") if c]
    return parts[: len(argv)] == argv or parts == argv


def _kill_procs(pids: list[int], sig=signal.SIGTERM) -> None:
    for pid in pids:
        try:
            os.kill(pid, sig)
        except OSError:
            pass


def kill_experiment(exp_dir: pathlib.Path) -> int:
    """The ``--mode kill`` backend (heyhi's scancel analog,
    heyhi/__init__.py:192-222): SIGTERM exactly the recorded PIDs whose
    command lines still match, then SIGKILL stragglers."""
    exp_dir = pathlib.Path(exp_dir)
    jobs_path = exp_dir / JOBS_FILE
    if not jobs_path.exists():
        log.info("no %s in %s; nothing to kill", JOBS_FILE, exp_dir)
        return 0
    jobs = json.loads(jobs_path.read_text())
    victims = [
        j for j in jobs.get("procs", [])
        if _pid_matches(j["pid"], j.get("argv", []))
    ]
    _kill_procs([j["pid"] for j in victims], signal.SIGTERM)
    deadline = time.time() + 10
    while time.time() < deadline and any(
        _pid_matches(j["pid"], j.get("argv", [])) for j in victims
    ):
        time.sleep(0.2)
    leftovers = [
        j["pid"] for j in victims
        if _pid_matches(j["pid"], j.get("argv", []))
    ]
    if leftovers:
        _kill_procs(leftovers, signal.SIGKILL)
    jobs_path.unlink(missing_ok=True)
    log.info("killed %d processes", len(victims))
    return len(victims)
