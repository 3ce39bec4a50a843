"""Test harness: force CPU with 8 virtual devices so pjit/mesh tests run
without TPU hardware (the standard JAX trick, SURVEY.md §4). Must run before
the first `import jax` in any test module."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The image's sitecustomize force-registers the axon TPU backend regardless of
# JAX_PLATFORMS; this config update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
