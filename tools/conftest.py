"""Probe-test configuration: force the CPU backend before JAX initialises.

Tests under tools/ are measurement-trail probes excluded from the main
suite (pytest.ini testpaths); when run explicitly they must NOT land on
the real TPU — the axon plugin's sitecustomize overrides JAX_PLATFORMS,
so (as in tests/conftest.py) the jax.config update is required.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
