"""Test harness configuration.

Tests run JAX on a virtual 8-device CPU mesh (multi-chip sharding logic is
validated without TPU hardware) with x64 enabled so the device evaluators can
be checked against the numpy float64 oracle at 1e-9 relative tolerance.
These env vars must be set before jax initializes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (after env setup, before any test imports jax)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
