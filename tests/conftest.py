"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the same mechanism
the driver uses for the multi-chip dry run).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# The container's sitecustomize imports jax at interpreter start (before this
# conftest runs) with JAX_PLATFORMS=axon baked in, so the env var alone is not
# enough — override through the live config as well.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat test runs skip XLA compilation of
# unchanged graphs (~35% off compile-heavy tests). NB: do NOT also enable
# jax_persistent_cache_enable_xla_caches here — the CPU AOT cache embeds
# machine features and falls back with SIGILL-risk warnings when they drift.
from rtvc_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_test_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
