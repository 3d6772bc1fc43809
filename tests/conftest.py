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
# persistent compilation cache: this box compiles slowly; shard_map steps
# recompile per test config otherwise
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running end-to-end tests"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
