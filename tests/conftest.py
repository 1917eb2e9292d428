"""Test configuration: run on a virtual 8-device CPU mesh.

Must set the environment before jax is imported anywhere (SURVEY.md §4:
multi-device tests use XLA's host-platform device-count override instead of
real TPUs).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (if present) pins jax_platforms at interpreter start;
# the env var alone is not enough to keep tests off the tunneled TPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(20240817)
