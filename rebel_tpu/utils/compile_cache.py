"""Persistent XLA compilation cache for the tunneled TPU backend.

In this environment TPU compiles go through a slow remote-compile
tunnel (tens of seconds per program); a long eval/training sweep
re-pays that cost for every jitted program in every process.  Enabling
JAX's persistent compilation cache makes every program after the first
process-launch a disk hit.  bench.py has done this since round 2; this
helper extends it to the trainer and the eval sweep so queued runs
share one cache.

Call before the first backend use.  No-op if the config was already
set (e.g. by a test harness that pins the platform).
"""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/jax_cache"


def enable(cache_dir: str = DEFAULT_DIR) -> None:
    import jax

    if jax.config.jax_compilation_cache_dir is not None:
        return  # respect a cache dir someone already configured
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
