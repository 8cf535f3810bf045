"""Fused Pallas SSIM vs the XLA separable implementation.

Runs the kernel in interpret mode (CPU-safe); on a real TPU session the
compiled path is exercised by ``ssim_eval_auto`` inside the eval harness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.ops.pallas.ssim_fused import (
    fits_vmem, ssim_eval_auto, ssim_eval_fused, ssim_eval_tiled,
    tiled_eligible)
from ai_based_frame_interpolation_tpu.ops.ssim import ssim_eval


def _pairs(rng, b=3, h=40, w=48):
    a = rng.integers(0, 255, (b, h, w, 1), np.uint8)
    noise = rng.integers(-25, 25, a.shape)
    bimg = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    return a, bimg


def test_fused_matches_xla_interpret(rng):
    a, b = _pairs(rng)
    ref = np.asarray(ssim_eval(jnp.asarray(a), jnp.asarray(b)))
    fused = np.asarray(ssim_eval_fused(jnp.asarray(a[..., 0]),
                                       jnp.asarray(b[..., 0]),
                                       interpret=True))
    np.testing.assert_allclose(fused, ref, atol=2e-4)


def test_fused_identical_images(rng):
    a, _ = _pairs(rng, b=1)
    fused = np.asarray(ssim_eval_fused(jnp.asarray(a[..., 0]),
                                       jnp.asarray(a[..., 0]),
                                       interpret=True))
    np.testing.assert_allclose(fused, [1.0], atol=1e-5)


def test_fits_vmem_gate():
    assert fits_vmem((4, 720, 1280, 1))
    assert not fits_vmem((4, 1080, 1920, 1))
    assert not fits_vmem((4, 256, 256, 3))


def test_tiled_matches_xla_interpret(rng):
    # tall enough for multiple tiles incl. a clamped last tile (90 valid
    # rows with 64-row tiles -> tiles at 0 and 26 with halo overlap)
    a, b = _pairs(rng, b=2, h=96, w=136)
    ref = np.asarray(ssim_eval(jnp.asarray(a), jnp.asarray(b)))
    tiled = np.asarray(ssim_eval_tiled(jnp.asarray(a[..., 0]),
                                       jnp.asarray(b[..., 0]),
                                       interpret=True))
    np.testing.assert_allclose(tiled, ref, atol=2e-4)


def test_tiled_exact_tile_multiple(rng):
    # h - 6 is an exact multiple of the tile: no clamp path at all
    a, b = _pairs(rng, b=1, h=70, w=128)
    ref = np.asarray(ssim_eval(jnp.asarray(a), jnp.asarray(b)))
    tiled = np.asarray(ssim_eval_tiled(jnp.asarray(a[..., 0]),
                                       jnp.asarray(b[..., 0]),
                                       interpret=True))
    np.testing.assert_allclose(tiled, ref, atol=2e-4)


def test_tiled_eligibility_gate():
    assert tiled_eligible((4, 1080, 1920, 1))      # the point of the kernel
    assert tiled_eligible((4, 2160, 3840, 1))      # 4K
    assert not tiled_eligible((4, 48, 1920, 1))    # too short for one tile
    assert not tiled_eligible((4, 1080, 8192, 1))  # row exceeds VMEM budget
    assert not tiled_eligible((4, 1080, 1920, 3))  # RGB -> XLA path


def test_auto_dispatch_fallback(rng):
    # RGB input is not kernel-eligible -> must still return correct values
    a = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    b = rng.integers(0, 255, (2, 32, 32, 3), np.uint8)
    auto = np.asarray(ssim_eval_auto(a, b))
    ref = np.asarray(ssim_eval(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(auto, ref, atol=1e-6)
