"""Test harness: CPU-backed JAX with 8 virtual devices so multi-device DP
collectives run without TPU hardware (SURVEY.md §4 test-strategy plan).

Must run before any jax backend initialization; the axon sitecustomize in
this image force-registers a TPU platform, so we override platform selection
explicitly rather than via JAX_PLATFORMS.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
