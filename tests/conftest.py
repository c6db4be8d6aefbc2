"""Test harness config: CPU backend with 8 virtual devices for sharding
tests, x64 available for oracle-parity tests."""

import os

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon harness pins JAX_PLATFORMS=axon via sitecustomize and ignores the
# env var; the config knob still wins. Tests always run on the virtual
# 8-device CPU mesh, with x64 available for fp64 oracle-parity tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA_DIR = "/root/reference/data"


@pytest.fixture()
def rng():
    # Function-scoped on purpose: a session-scoped generator makes every
    # test's data depend on which tests ran before it (flaky tolerances
    # whenever a test is added or reordered).
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running golden-image tests")
