"""Parity of the fused double-conv core kernel with the XLA conv pair.

Interpret mode on CPU (the TPU compile + perf A/B lives in
``scripts/dconv_probe.py``). Mirrors the structure of
``tests/test_refine_fused.py``: random weights at real core shapes,
bf16 compute, tolerance sized to one bf16 rounding step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.ops.pallas.dconv_fused import (
    double_conv_fused, double_conv_reference, eligible)


def _to_rowmajor(x_nhwc, wp):
    b, h, w, c = x_nhwc.shape
    x = jnp.transpose(x_nhwc, (0, 1, 3, 2))           # [B, H, C, W]
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - w)))


def _from_rowmajor(y, w):
    return jnp.transpose(y[..., :w], (0, 1, 3, 2))    # [B, H, W, C]


@pytest.mark.parametrize(
    "h,w,wp,cin,mid,cout",
    [
        (16, 48, 128, 8, 16, 16),      # padded lanes (wp > w)
        (16, 128, 128, 16, 8, 8),      # edge case: no padded lanes
        (24, 120, 128, 32, 16, 8),     # th=8 path, uneven channel trio
    ])
def test_parity_interpret(h, w, wp, cin, mid, cout):
    rng = np.random.default_rng(42)
    b = 2
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, mid)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(mid,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, mid, cout)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    want = double_conv_reference(x, w1, b1, w2, b2)
    xt = _to_rowmajor(x, wp)
    assert eligible(xt.shape)
    got = _from_rowmajor(
        double_conv_fused(xt, w1, b1, w2, b2, image_width=w,
                          interpret=True), w)

    assert got.shape == want.shape
    # the kernel accumulates the 3 kx partials in f32 before one bf16
    # round where XLA rounds once per conv output: <= a few bf16 ulps at
    # these magnitudes (activations O(10) after two 0.2-scaled convs)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.25, rtol=0.05)


def test_no_relu2_mode():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 8)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.3, jnp.float32)
    b1 = jnp.zeros((8,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 8, 8)) * 0.3, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    want = double_conv_reference(x, w1, b1, w2, b2, relu2=False)
    got = _from_rowmajor(
        double_conv_fused(_to_rowmajor(x, 128), w1, b1, w2, b2,
                          relu2=False, image_width=32, interpret=True), 32)
    assert float(jnp.min(want)) < 0          # relu actually skipped
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.25, rtol=0.05)


def test_border_zero_padding_semantics():
    """A one-hot input at the image corner must see zero padding (not
    wrap-around) through both convs."""
    h, w, wp, c = 16, 48, 128, 8
    x = np.zeros((1, h, w, c), np.float32)
    x[0, 0, 0, 0] = 1.0
    x[0, h - 1, w - 1, 1] = 1.0
    w1 = np.full((3, 3, c, c), 0.1, np.float32)
    w2 = np.full((3, 3, c, c), 0.1, np.float32)
    b = np.zeros((c,), np.float32)
    want = double_conv_reference(jnp.asarray(x, jnp.bfloat16), w1, b, w2, b)
    got = _from_rowmajor(
        double_conv_fused(_to_rowmajor(jnp.asarray(x, jnp.bfloat16), wp),
                          w1, b, w2, b, image_width=w, interpret=True), w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.02, rtol=0.05)


def test_odd_image_height_row_padding():
    """True height 20 padded to 24 rows: masked rows must reproduce the
    NHWC SAME-conv result exactly (down2/up2-style odd core levels)."""
    h, hp, w, wp, cin, mid, cout = 20, 24, 48, 128, 16, 8, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cin, mid)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(mid,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, mid, cout)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    want = double_conv_reference(x, w1, b1, w2, b2)
    xt = jnp.pad(_to_rowmajor(x, wp), ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    got = _from_rowmajor(
        double_conv_fused(xt, w1, b1, w2, b2, image_width=w,
                          image_height=h, interpret=True), w)[:, :h]
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.25, rtol=0.05)


def test_up_block_parity_interpret():
    """Fused up-block == upsample2x_half_pixel + concat + conv pair."""
    import jax

    from ai_based_frame_interpolation_tpu.ops.pallas.dconv_fused import (
        up_double_conv_fused)
    from ai_based_frame_interpolation_tpu.ops.resize import (
        upsample2x_half_pixel)

    rng = np.random.default_rng(7)
    b, h, w_true, wp, cs, cu, mid, cout = 2, 32, 120, 128, 16, 8, 16, 8
    skip_n = jnp.asarray(rng.normal(size=(b, h, w_true, cs)), jnp.bfloat16)
    low_n = jnp.asarray(rng.normal(size=(b, h // 2, w_true // 2, cu)),
                        jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, cs + cu, mid)) * 0.2,
                     jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(mid,)), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, mid, cout)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)

    up = upsample2x_half_pixel(low_n)
    want = double_conv_reference(
        jnp.concatenate([skip_n, up.astype(skip_n.dtype)], axis=-1),
        w1, b1, w2, b2)

    def to_t(x, wpad):
        xt = jnp.transpose(x, (0, 1, 3, 2))
        return jnp.pad(xt, ((0, 0), (0, 0), (0, 0),
                            (0, wpad - xt.shape[-1])))

    got_t = up_double_conv_fused(to_t(skip_n, wp), to_t(low_n, wp // 2),
                                 w1, b1, w2, b2, image_width=w_true,
                                 interpret=True)
    got = jnp.transpose(got_t[..., :w_true], (0, 1, 3, 2))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=0.25, rtol=0.05)
