"""Test configuration: force JAX onto 8 virtual CPU devices.

The environment's sitecustomize imports jax and registers the TPU plugin at
interpreter start, so we steer the platform via jax.config (which works
post-import) rather than env vars. 8 virtual CPU devices let the sharding
tests exercise a real multi-device mesh without TPU hardware, per the
multi-chip test strategy (SURVEY.md §4/§7 phase 9).
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # older jax: fall back to XLA flag (read at backend init)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running statistical tests")
    config.addinivalue_line(
        "markers",
        "heavy: interpret-mode kernel parity / recovery-fit tests (>=10s "
        "each). Fast iteration tier: pytest -m 'not heavy' (~2-3 min); "
        "the full suite runs everything (VERDICT r3 #8)")
