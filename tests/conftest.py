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

# test tiers (this 1-core VM: full suite ~60 min, dist files compile-bind
# 15-40 min EACH): `-m "not dist and not slow"` is the fast core loop,
# `-m slow` the heavy single-chip files, `-m dist` the virtual-mesh files.
_DIST_FILES = ("test_dist_",)
_SLOW_FILES = (
    "test_sample_sort.py",   # interpret-mode Pallas pipeline
    "test_extract.py",       # interpret-mode extraction kernel
    "test_expand.py",        # interpret-mode run-append kernel
    "test_properties.py",    # hypothesis property sweeps
)


def pytest_configure(config):
    config.addinivalue_line("markers", "dist: virtual-mesh distributed")
    config.addinivalue_line("markers", "slow: heavy single-chip files")


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = item.fspath.basename
        if fname.startswith(_DIST_FILES):
            item.add_marker(pytest.mark.dist)
        elif fname in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
