"""Test harness configuration.

Tests run on CPU with 8 virtual devices so the multi-chip sharding paths
(mesh + halo exchange + disparity sharding) are exercised without TPU
hardware, per SURVEY.md §4's strategy.  Must be set before jax imports.
"""

import os

# The axon sitecustomize registers the TPU backend at interpreter start and
# overrides JAX_PLATFORMS, so force CPU through jax.config instead.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
