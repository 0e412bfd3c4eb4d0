"""Test configuration: CPU backend with 8 virtual devices (multi-chip
sharding tests run on a virtual mesh) and float64 enabled (parity config).

Note: the environment's sitecustomize preloads jax and registers the TPU
backend, so the platform must be forced through ``jax.config`` (env vars are
already consumed); the XLA host-device-count flag still applies because no
backend has been initialized yet at conftest import time.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
