"""Test harness configuration.

Runs everything on CPU with 8 virtual devices (SURVEY §4's multi-chip-without-a-
cluster strategy) so sharding tests exercise real ``Mesh``/``shard_map`` paths, and
Pallas kernels run through the TPU interpreter.
"""
import os

# Hard-set (not setdefault): this image's sitecustomize pins JAX_PLATFORMS=axon for
# the tunneled TPU and already imports jax, so both the env var AND jax.config must
# be overridden; tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Functional XLA has no data races to detect (SURVEY §5); the numerical analogue
# is NaN poisoning — surface it at the op that produced it when requested.
if os.environ.get("RT_DEBUG_NANS"):
    jax.config.update("jax_debug_nans", True)

import numpy as np
import pytest

import python_ray_tracer_tpu as rt


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow (full suite; ~15 min on 4 cores)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: >45 s on the 4-core CI host; excluded by default, "
        "run with --runslow (or RT_FULL_TESTS=1)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RT_FULL_TESTS"):
        return
    skip_slow = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


@pytest.fixture(scope="session")
def demo_scene():
    return rt.default_scene()


@pytest.fixture(scope="session")
def small_camera():
    return rt.default_camera((32, 32))
