"""Test harness config: CPU backend with 8 virtual devices (the standard
fake-backend trick for exercising shard_map/collectives without a TPU) and
x64 enabled so the full 64-bit type matrix is testable."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# sitecustomize may have imported jax already (axon boot) with
# JAX_PLATFORMS=axon baked in -- override through the config API, which works
# post-import, so tests always run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
