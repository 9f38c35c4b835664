"""Test harness config: run all tests on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware, and enable
x64 so float64 parity modes (matching the reference's double-precision
solvers, /root/reference/csrc/liars_dice/subgame_solving.h:39) work.

NOTE: this environment force-registers an `axon` TPU backend via
sitecustomize and JAX_PLATFORMS=axon; plain env vars do not stick, so we
pin the platform through jax.config before any backend is initialized.
"""

import os

# Must be set before jax reads XLA_FLAGS at first backend init.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
