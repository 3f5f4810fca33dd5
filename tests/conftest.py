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

import sys  # noqa: E402

import pytest  # noqa: E402


# The axon TPU plugin's C++ teardown can abort at interpreter exit
# (observed 2026-08-20: "terminate called ..." AFTER a fully green
# "241 passed" summary → RC=134, while another process shared the remote
# tunnel).  The suite's verdict is pytest's exitstatus; don't let an
# out-of-scope plugin atexit turn green into red.  The hard exit lives in
# pytest_unconfigure, which runs after the terminal summary is printed —
# and only fires when that plugin is actually loaded (advisor r3: plain-CPU
# runs keep normal interpreter teardown, e.g. coverage atexit flushes).
_exitstatus = None


def _axon_plugin_loaded() -> bool:
    return any("axon" in name for name in sys.modules)


def pytest_sessionfinish(session, exitstatus):
    global _exitstatus
    _exitstatus = int(exitstatus)


@pytest.hookimpl(trylast=True)
def pytest_unconfigure(config):
    if _exitstatus is not None and _axon_plugin_loaded():
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(_exitstatus)
