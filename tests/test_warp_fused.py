"""Fused flow-sampler kernel (ops/pallas/warp_fused) vs the XLA path.

The kernel must reproduce the exact ``warp_impl="shifts"`` semantics of
``ops/warp.py`` (per-axis clamp, border replicate, X-at-source-row) and the
Super-SloMo blend of ``models/flow.py:sample`` — interpret mode on CPU here,
compiled engine-level comparison happens implicitly on TPU runs where the
router turns it on.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.ops.pallas.warp_fused import (
    eligible, sample_fused)
from ai_based_frame_interpolation_tpu.ops.warp import backward_warp


@pytest.mark.parametrize("shape,rmax,ts", [
    ((2, 72, 160, 1), 8, [0.5, 0.25]),
    ((1, 129, 257, 1), 8, [0.33]),      # non-multiple H and W
    ((1, 16, 128, 1), 4, [0.5]),
    ((2, 72, 160, 3), 8, [0.5, 0.3]),   # RGB: per-channel DMA path
])
def test_sample_fused_matches_xla_shifts(shape, rmax, ts):
    b, h, w, c = shape
    rng = np.random.default_rng(42)
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1.5 * rmax, 1.5 * rmax, (b, h, w, 2)),
                       jnp.float32)
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 1)), jnp.float32)
    t = jnp.asarray(ts, jnp.float32)

    out, g0, g1 = sample_fused(f1, f2, flow, mask, t, max_flow=rmax,
                               interpret=True)
    tb = t[:, None, None, None]
    g0r = backward_warp(f1, -tb * flow, impl="shifts", max_flow=rmax)
    g1r = backward_warp(f2, (1.0 - tb) * flow, impl="shifts", max_flow=rmax)
    w0 = (1 - tb) * mask
    w1 = tb * (1 - mask)
    outr = (w0 * g0r + w1 * g1r) / (w0 + w1 + 1e-6)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g0r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g1r), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(outr), atol=1e-5)


def test_engine_fused_sampler_matches_xla(tiny_frames):
    """End-to-end: a flow engine forced onto the kernel route must emit the
    same frames as the XLA route (1-LSB uint8 tolerance — the Flax path
    interpolates in bf16, the kernel in f32)."""
    f1, f2 = tiny_frames
    outs = {}
    for impl in ("xla", "pallas"):
        eng = InterpolationEngine.random_init(
            ModelConfig(arch="flow", base_width=4, refine_width=8,
                        max_flow=8), seed=11, compute_dtype=jnp.float32)
        eng.sampler_impl = impl
        outs[impl] = eng.generate_intermediate_frames(f1, f2, 3)
    for a, b in zip(outs["xla"], outs["pallas"]):
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)


def test_engine_fused_sampler_rgb_matches_xla():
    """RGB engine route through the kernel (per-channel DMA, shared warp
    weights) == the XLA route."""
    y, x = np.mgrid[0:48, 0:128].astype(np.float32)
    f1 = np.stack([(127 + a * np.sin(x / p) * np.cos(y / q))
                   for a, p, q in ((80, 7, 5), (60, 5, 9), (90, 11, 4))],
                  axis=-1).astype(np.uint8)
    f2 = np.roll(np.roll(f1, 4, axis=1), 2, axis=0)
    outs = {}
    for impl in ("xla", "pallas"):
        eng = InterpolationEngine.random_init(
            ModelConfig(arch="flow", channels=3, base_width=4,
                        refine_width=8, max_flow=8), seed=11,
            compute_dtype=jnp.float32)
        eng.sampler_impl = impl
        eng.flow_split_override = False   # CPU: keep one program
        outs[impl] = eng.generate_intermediate_frames(f1, f2, 3)
    for a, b in zip(outs["xla"], outs["pallas"]):
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)


def test_engine_full_fused_route_matches_xla(tiny_frames):
    """Sampler kernel + fused refine head together (the production TPU flow
    route) vs the all-XLA route."""
    f1, f2 = tiny_frames
    outs = {}
    for impl in ("xla", "pallas"):
        eng = InterpolationEngine.random_init(
            ModelConfig(arch="flow", base_width=4, refine_width=8,
                        max_flow=8), seed=11, compute_dtype=jnp.float32)
        eng.sampler_impl = impl
        eng.refine_impl = impl if impl == "pallas" else "xla"
        outs[impl] = eng.generate_intermediate_frames(f1, f2, 3)
    for a, b in zip(outs["xla"], outs["pallas"]):
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)


def test_engine_bidir_fused_refine_matches_xla(tiny_frames):
    """Bidir flow (sampler kernel ineligible) with the fused refine head:
    sample_parts + kernel == the monolithic Flax sample."""
    f1, f2 = tiny_frames
    outs = {}
    for impl in ("xla", "pallas"):
        eng = InterpolationEngine.random_init(
            ModelConfig(arch="flow", base_width=4, refine_width=8,
                        max_flow=8, flow_bidir=True), seed=11,
            compute_dtype=jnp.float32)
        eng.refine_impl = impl
        outs[impl] = eng.generate_intermediate_frames(f1, f2, 3)
    for a, b in zip(outs["xla"], outs["pallas"]):
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)


def test_eligibility_guards():
    shape = (1, 64, 128, 1)
    assert eligible(ModelConfig(arch="flow"), shape)
    assert not eligible(ModelConfig(arch="flow", flow_bidir=True), shape)
    assert not eligible(ModelConfig(arch="flow", warp_impl="gather4"), shape)
    assert eligible(ModelConfig(arch="flow"), (1, 64, 128, 3))
    assert not eligible(ModelConfig(arch="flow"), (1, 64, 128, 2))
    # too narrow for the displacement bound
    assert not eligible(ModelConfig(arch="flow", max_flow=64),
                        (1, 64, 100, 1))
