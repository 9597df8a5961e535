"""Test harness configuration.

Tests run JAX on a virtual 8-device CPU mesh (multi-chip sharding logic is
validated without TPU hardware) with x64 enabled so the device evaluators can
be checked against the numpy float64 oracle at 1e-9 relative tolerance.
These env vars must be set before jax initializes.

Set ``WFTPU_TEST_TPU=1`` to keep the session's default (TPU) platform
instead -- kernel tests then compile for real hardware (x64 parity tests
will be skipped by their own tolerance failures; intended for smoke runs).
"""

import os
import sys

# The AOT Mosaic-lowering smoke tests (test_tpu_lowering.py) trace the
# full kernels; jax's recursive jaxpr walks overflow the default 1000
# frame limit on the bigger ones.
sys.setrecursionlimit(100_000)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (after env setup, before any test imports jax)

if not os.environ.get("WFTPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
