"""Test config: force CPU JAX with 8 virtual devices BEFORE jax initializes.

This is the standard JAX way to test multi-device sharding without TPU
hardware (SURVEY.md §4): the pjit/Mesh tests below run on an 8-way virtual
CPU mesh exactly as they would over a v5e-8's ICI.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: repeated test runs skip recompiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def tiny_frames(rng):
    """A pair of 64x64 grayscale uint8 frames with structure (not pure noise)."""
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    f1 = (127 + 80 * np.sin(x / 7.0) * np.cos(y / 5.0)).astype(np.uint8)[..., None]
    f2 = np.roll(f1, 6, axis=1)
    return f1, f2
