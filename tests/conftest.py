"""Test harness: force a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (SURVEY.md §4e)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env vars)

# The environment may pre-set JAX_PLATFORMS=axon (real TPU tunnel); the config
# update below wins over the env var even if jax was imported early.
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers",
                            "slow: long-running end-to-end test")


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
