"""Polyphase fused up2+conv (ops/polyphase.py) vs the reference composition.

The fused op must equal conv3x3_SAME(concat([skip, up2_half_pixel(x)]))
bit-for-bit in f32 — including the edge-clamped upsample taps and the
conv's zero padding at the full-res border (the correction terms).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from ai_based_frame_interpolation_tpu.models import unet as unet_mod
from ai_based_frame_interpolation_tpu.models.unet import (
    FrameInterpolationUNet)
from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.ops.polyphase import (
    up2_conv_half_pixel)
from ai_based_frame_interpolation_tpu.ops.resize import (
    upsample2x_half_pixel)


def _ref(x_low, x_skip, kernel, bias):
    up = upsample2x_half_pixel(x_low)
    z = jnp.concatenate([x_skip, up], axis=-1)
    out = lax.conv_general_dilated(
        z, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


@pytest.mark.parametrize("h,w,cl,cs,co", [
    (4, 6, 3, 2, 5),       # tiny, exercises every border/corner case
    (8, 8, 8, 8, 4),
    (5, 3, 2, 4, 3),       # odd low-res dims
    (16, 12, 4, 4, 8),
])
def test_fused_equals_composition_f32(h, w, cl, cs, co):
    rng = np.random.default_rng(h * 100 + w)
    x_low = jnp.asarray(rng.normal(size=(2, h, w, cl)), jnp.float32)
    x_skip = jnp.asarray(rng.normal(size=(2, 2 * h, 2 * w, cs)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, cs + cl, co)) * 0.2,
                         jnp.float32)
    bias = jnp.asarray(rng.normal(size=(co,)), jnp.float32)

    ref = _ref(x_low, x_skip, kernel, bias)
    got = up2_conv_half_pixel(x_low, x_skip, kernel, bias,
                              compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)


def test_fused_bf16_close():
    rng = np.random.default_rng(0)
    x_low = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.bfloat16)
    x_skip = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.bfloat16)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 8, 4)) * 0.2, jnp.float32)
    ref = _ref(x_low.astype(jnp.float32), x_skip.astype(jnp.float32),
               kernel, None)
    got = up2_conv_half_pixel(x_low, x_skip, kernel, None,
                              compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=0.15)


def test_gradients_flow():
    rng = np.random.default_rng(1)
    x_low = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
    x_skip = jnp.asarray(rng.normal(size=(1, 8, 8, 2)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 4, 3)), jnp.float32)

    def loss_fused(k):
        return jnp.sum(up2_conv_half_pixel(x_low, x_skip, k, None,
                                           compute_dtype=jnp.float32) ** 2)

    def loss_ref(k):
        return jnp.sum(_ref(x_low, x_skip, k, None) ** 2)

    g1 = jax.grad(loss_fused)(kernel)
    g2 = jax.grad(loss_ref)(kernel)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=1e-3)


def test_model_polyphase_matches_lerp_path_and_params():
    """UNet(upsample='half_pixel') with UP_POLYPHASE on/off: identical
    param trees (checkpoint-interchangeable) and near-identical outputs."""
    cfg = ModelConfig(channels=1, base_width=8, space_to_depth=2,
                      upsample="half_pixel")
    model = FrameInterpolationUNet(cfg=cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(2)
    f1 = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(1, 32, 32, 1)), jnp.float32)

    old = unet_mod.UP_POLYPHASE
    try:
        unet_mod.UP_POLYPHASE = True
        v_poly = jax.jit(model.init)(jax.random.PRNGKey(0), f1, f2)
        out_poly = jax.jit(model.apply)(v_poly, f1, f2)
        unet_mod.UP_POLYPHASE = False
        v_lerp = jax.jit(model.init)(jax.random.PRNGKey(0), f1, f2)
        out_lerp = jax.jit(model.apply)(v_lerp, f1, f2)
    finally:
        unet_mod.UP_POLYPHASE = old

    t1 = jax.tree_util.tree_structure(v_poly)
    t2 = jax.tree_util.tree_structure(v_lerp)
    assert t1 == t2
    for a, b in zip(jax.tree_util.tree_leaves(v_poly),
                    jax.tree_util.tree_leaves(v_lerp)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    np.testing.assert_allclose(np.asarray(out_poly), np.asarray(out_lerp),
                               rtol=0, atol=1e-4)
