"""Test harness config: run on CPU with 8 virtual devices so multi-chip
sharding is exercised without TPU hardware (SURVEY §4 implication (d)).

The axon TPU plugin in this image ignores ``JAX_PLATFORMS`` from the
environment, so we force the platform through ``jax.config`` before any
backend is initialised.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
