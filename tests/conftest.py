"""Test configuration: force an 8-device CPU mesh before JAX initialises.

Multi-chip sharding code paths are exercised on a virtual 8-device CPU
backend (SURVEY.md §4d), so the suite runs anywhere without TPU hardware.
"""

import os

# Must happen before jax initialises a backend.  NOTE: setting the
# JAX_PLATFORMS env var is NOT enough in this environment — the axon TPU
# plugin's sitecustomize calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter start, overriding the env var; tests would
# silently run on (and contend for) the single real TPU.  Overriding via
# jax.config after import wins.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def golden_dir():
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
