"""Test configuration: run the suite on a virtual 8-device CPU platform so
multi-chip mesh code is exercised without TPU hardware (the standard JAX
fake-backend trick), and numerics are deterministic."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The env var alone can be overridden by an externally-set platform plugin
# (e.g. JAX_PLATFORMS=axon in the TPU tunnel environment) — force it.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
