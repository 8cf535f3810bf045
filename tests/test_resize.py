"""Golden tests: matmul-based bilinear resize vs torch.nn.functional.interpolate.

The align_corners=True x2 upsample is the decoder's resampling primitive
(reference ``model/unet.py:40``); exact parity here gates the SSIM-delta
target (SURVEY.md §7 "hard parts").
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.ops.resize import (
    crop_to, pad_to_multiple, resize_bilinear, upsample2x_align_corners)

torch = pytest.importorskip("torch")


def torch_resize(x_nhwc, out_hw, align_corners):
    t = torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)
    y = torch.nn.functional.interpolate(
        t, size=out_hw, mode="bilinear", align_corners=align_corners)
    return y.permute(0, 2, 3, 1).numpy()


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)),      # the decoder's 2x
    ((7, 9), (14, 18)),      # odd sizes
    ((16, 16), (8, 8)),      # downscale
    ((5, 5), (13, 7)),       # non-integer ratio
    ((32, 24), (32, 48)),    # one axis only
])
def test_matches_torch(align, in_hw, out_hw, rng):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    theirs = torch_resize(x, out_hw, align)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_upsample2x_helper(rng):
    x = rng.standard_normal((1, 12, 10, 4)).astype(np.float32)
    ours = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    theirs = torch_resize(x, (24, 20), True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_upsample2x_half_pixel_matches_torch(rng):
    from ai_based_frame_interpolation_tpu.ops.resize import (
        upsample2x_half_pixel)

    x = rng.standard_normal((2, 12, 10, 4)).astype(np.float32)
    # f32 path: shift+lerp+interleave, exact vs torch align_corners=False
    ours = np.asarray(upsample2x_half_pixel(jnp.asarray(x)))
    theirs = torch_resize(x, (24, 20), False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
    # bf16 path: W axis goes through the constant-matrix MXU contraction
    ours_bf = np.asarray(
        upsample2x_half_pixel(jnp.asarray(x, jnp.bfloat16)), np.float32)
    np.testing.assert_allclose(ours_bf, theirs, rtol=0.02, atol=0.02)


def test_wmat_axis_matches_lerp_bf16(rng):
    """The W-axis matmul (used inside resize_bilinear for narrow bf16
    inputs) must agree with the exact f32 gather+lerp to bf16 precision."""
    x = rng.standard_normal((2, 9, 40, 8)).astype(np.float32)
    exact = torch_resize(x, (18, 80), True)
    ours = np.asarray(
        resize_bilinear(jnp.asarray(x, jnp.bfloat16), (18, 80)), np.float32)
    np.testing.assert_allclose(ours, exact, rtol=0.02, atol=0.02)


def test_identity_when_same_size(rng):
    x = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    y = np.asarray(resize_bilinear(jnp.asarray(x), (8, 8)))
    np.testing.assert_array_equal(x, y)


def test_pad_crop_roundtrip(rng):
    x = rng.standard_normal((2, 1080, 1920 // 8, 1)).astype(np.float32)
    padded, hw = pad_to_multiple(jnp.asarray(x), 16)
    assert padded.shape[1] % 16 == 0 and padded.shape[2] % 16 == 0
    assert padded.shape[1] == 1088
    back = np.asarray(crop_to(padded, hw))
    np.testing.assert_array_equal(back, x)


def test_grad_flows_through_resize(rng):
    import jax

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
    g = jax.grad(lambda v: resize_bilinear(v, (16, 16)).sum())(x)
    # row-stochastic interpolation: total weight is conserved
    assert np.isfinite(np.asarray(g)).all()
    np.testing.assert_allclose(float(g.sum()), 16 * 16, rtol=1e-4)
