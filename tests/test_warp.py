"""Backward warp op: identity, integer shifts, bilinear blending,
border replication, differentiability, numpy oracle."""

import numpy as np

import jax
import jax.numpy as jnp

from ai_based_frame_interpolation_tpu.ops.warp import backward_warp


def _np_backward_warp(img, flow):
    """Straightforward numpy oracle (border-replicate bilinear sampling)."""
    b, h, w, c = img.shape
    out = np.zeros_like(img, dtype=np.float64)
    for bi in range(b):
        for yy in range(h):
            for xx in range(w):
                x = xx + float(flow[bi, yy, xx, 0])
                y = yy + float(flow[bi, yy, xx, 1])
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                wx, wy = x - x0, y - y0
                xs = [min(max(x0, 0), w - 1), min(max(x0 + 1, 0), w - 1)]
                ys = [min(max(y0, 0), h - 1), min(max(y0 + 1, 0), h - 1)]
                top = (img[bi, ys[0], xs[0]] * (1 - wx)
                       + img[bi, ys[0], xs[1]] * wx)
                bot = (img[bi, ys[1], xs[0]] * (1 - wx)
                       + img[bi, ys[1], xs[1]] * wx)
                out[bi, yy, xx] = top * (1 - wy) + bot * wy
    return out


def test_zero_flow_is_identity(rng):
    img = jnp.asarray(rng.random((2, 8, 9, 3), np.float32))
    out = jax.jit(backward_warp)(img, jnp.zeros((2, 8, 9, 2)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_integer_shift_matches_roll_interior(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))
    # flow (dx=2, dy=0): output[y, x] = img[y, x+2]
    flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(2.0)
    out = np.asarray(jax.jit(backward_warp)(img, flow))
    np.testing.assert_allclose(out[0, :, :6], np.asarray(img)[0, :, 2:],
                               atol=1e-6)
    # border replicate: columns past the right edge hold the edge value
    edge = np.broadcast_to(np.asarray(img)[0, :, 7:8], out[0, :, 6:].shape)
    np.testing.assert_allclose(out[0, :, 6:], edge, atol=1e-6)


def test_half_pixel_is_neighbor_average(rng):
    img = jnp.asarray(rng.random((1, 6, 6, 1), np.float32))
    flow = jnp.zeros((1, 6, 6, 2)).at[..., 1].set(0.5)  # dy = +0.5
    out = np.asarray(jax.jit(backward_warp)(img, flow))
    a = np.asarray(img)
    np.testing.assert_allclose(out[0, :5], 0.5 * (a[0, :5] + a[0, 1:]),
                               atol=1e-6)


def test_matches_numpy_oracle(rng):
    img = rng.random((2, 7, 9, 2)).astype(np.float32)
    flow = (rng.random((2, 7, 9, 2)).astype(np.float32) - 0.5) * 6
    out = np.asarray(jax.jit(backward_warp)(jnp.asarray(img),
                                            jnp.asarray(flow)))
    np.testing.assert_allclose(out, _np_backward_warp(img, flow),
                               atol=1e-5)


def test_differentiable_in_flow_and_pixels(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))
    flow = jnp.asarray((rng.random((1, 8, 8, 2)).astype(np.float32) - 0.5))
    tgt = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))

    def loss(im, fl):
        return jnp.mean((backward_warp(im, fl) - tgt) ** 2)

    gi, gf = jax.jit(jax.grad(loss, argnums=(0, 1)))(img, flow)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).max()) > 0  # flow actually receives gradient


def test_bfloat16_image_keeps_f32_coordinates(rng):
    # coordinates are computed in f32 even for bf16 images: a large shift
    # at a far pixel position must stay exact (bf16 would quantize x+dx)
    img = jnp.asarray(rng.random((1, 4, 300, 1), np.float32), jnp.bfloat16)
    flow = jnp.zeros((1, 4, 300, 2)).at[..., 0].set(-7.0)
    out = np.asarray(jax.jit(backward_warp)(img, flow).astype(jnp.float32))
    a = np.asarray(img.astype(jnp.float32))
    np.testing.assert_allclose(out[0, :, 200], a[0, :, 193], atol=1e-2)


def test_patch_impl_matches_gather4(rng):
    # ONE 2x2-slice gather vs four 1-element gathers: bit-identical,
    # including replicate-border behavior under large displacements
    img = rng.random((2, 17, 23, 3)).astype(np.float32)
    flow = ((rng.random((2, 17, 23, 2)) - 0.5) * 60).astype(np.float32)
    a = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="gather4"))(
            jnp.asarray(img), jnp.asarray(flow)))
    b = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="patch"))(
            jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_allclose(a, _np_backward_warp(img, flow), atol=1e-5)


def test_patch_impl_differentiable(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))
    flow = jnp.asarray((rng.random((1, 8, 8, 2)).astype(np.float32) - 0.5))

    def loss(im, fl):
        return jnp.mean(backward_warp(im, fl, impl="patch") ** 2)

    gi, gf = jax.jit(jax.grad(loss, argnums=(0, 1)))(img, flow)
    assert np.isfinite(np.asarray(gi)).all()
    assert float(jnp.abs(np.asarray(gf)).max()) > 0


def test_shifts_impl_exact_when_dx_is_y_constant(rng):
    """The separable shifts warp is EXACT (vs the 2-D oracle) whenever the
    x-displacement does not vary along y — the only approximation is
    sampling dx at the source row (ops/warp.py shifts docstring)."""
    img = rng.random((2, 12, 15, 2)).astype(np.float32)
    dx = ((rng.random((2, 1, 15)) - 0.5) * 6).astype(np.float32)
    dy = ((rng.random((2, 12, 15)) - 0.5) * 6).astype(np.float32)
    flow = np.stack([np.broadcast_to(dx, (2, 12, 15)), dy], axis=-1)
    out = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="shifts", max_flow=8))(
            jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, _np_backward_warp(img, flow),
                               atol=1e-5)


def test_shifts_impl_close_to_oracle_on_smooth_fields(rng):
    """On a smooth y-varying field the second-order deviation
    (|dy| * d(dx)/dy, scaled by the image gradient) stays small on
    natural-smoothness content."""
    yy, xx = np.mgrid[0:24, 0:24].astype(np.float32)
    img = (0.5 + 0.4 * np.sin(xx / 5.0) * np.cos(yy / 7.0))[
        None, ..., None].astype(np.float32)
    dx = 2.0 * np.sin(yy / 8.0)[None]  # gentle variation along y
    dy = 1.5 * np.cos(xx / 8.0)[None]
    flow = np.stack([dx, dy], axis=-1)
    out = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="shifts", max_flow=8))(
            jnp.asarray(img), jnp.asarray(flow)))
    oracle = _np_backward_warp(img, flow)
    assert np.abs(out - oracle).mean() < 0.02


def test_shifts_impl_clamps_to_max_flow(rng):
    """Displacements beyond +-max_flow behave exactly like the clamped
    field (gather4 has no bound, so compare against gather4 of the
    pre-clamped flow)."""
    img = rng.random((1, 10, 40, 1)).astype(np.float32)
    dx = np.full((1, 10, 40), 11.0, np.float32)  # beyond the bound of 4
    flow = np.stack([dx, np.zeros_like(dx)], axis=-1)
    clamped = np.clip(flow, -4, 4)
    out = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="shifts", max_flow=4))(
            jnp.asarray(img), jnp.asarray(flow)))
    ref = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(clamped)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_shifts_impl_border_replicate(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))
    flow = jnp.zeros((1, 8, 8, 2)).at[..., 0].set(3.0)
    out = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="shifts", max_flow=4))(
            img, flow))
    a = np.asarray(img)
    np.testing.assert_allclose(out[0, :, :5], a[0, :, 3:], atol=1e-6)
    edge = np.broadcast_to(a[0, :, 7:8], out[0, :, 5:].shape)
    np.testing.assert_allclose(out[0, :, 5:], edge, atol=1e-6)


def test_shifts_impl_differentiable(rng):
    img = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))
    flow = jnp.asarray((rng.random((1, 8, 8, 2)).astype(np.float32) - 0.5))
    tgt = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))

    def loss(im, fl):
        return jnp.mean(
            (backward_warp(im, fl, impl="shifts", max_flow=4) - tgt) ** 2)

    gi, gf = jax.jit(jax.grad(loss, argnums=(0, 1)))(img, flow)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).max()) > 0


def test_shifts_impl_bfloat16(rng):
    img = jnp.asarray(rng.random((1, 4, 300, 1), np.float32), jnp.bfloat16)
    flow = jnp.zeros((1, 4, 300, 2)).at[..., 0].set(-7.0)
    out = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="shifts", max_flow=8))(
            img, flow).astype(jnp.float32))
    a = np.asarray(img.astype(jnp.float32))
    np.testing.assert_allclose(out[0, :, 200], a[0, :, 193], atol=1e-2)


def test_pyramid_impl_exact_on_constant_field(rng):
    """On a locally constant field the two-level warp is exact: the coarse
    level is an integer shift and the fine level the ordinary bilinear
    shifts warp of the residual."""
    img = rng.random((1, 16, 64, 1)).astype(np.float32)
    flow = np.zeros((1, 16, 64, 2), np.float32)
    flow[..., 0], flow[..., 1] = 13.3, -5.7
    out = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="pyramid", max_flow=32))(
            jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, _np_backward_warp(img, flow), atol=1e-5)


def test_pyramid_impl_close_to_shifts_on_smooth_fields(rng):
    """vs the direct shifts warp (the semantics it approximates), the
    deviation is confined to coarse-quantization boundaries of the field
    and is second-order on smooth fields."""
    yy, xx = np.mgrid[0:48, 0:48].astype(np.float32)
    img = (0.5 + 0.4 * np.sin(xx / 5.0) * np.cos(yy / 7.0))[
        None, ..., None].astype(np.float32)
    dx = (10.0 * np.sin(yy / 15.0) + 6 * np.cos(xx / 11.0))[None]
    dy = (8.0 * np.cos(xx / 13.0))[None]
    flow = np.stack([dx, dy], axis=-1)
    s = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="shifts", max_flow=32))(
            jnp.asarray(img), jnp.asarray(flow)))
    p = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="pyramid", max_flow=32))(
            jnp.asarray(img), jnp.asarray(flow)))
    assert np.abs(p - s).mean() < 0.01


def test_pyramid_impl_small_bound_falls_back_to_shifts(rng):
    """When 2*max_flow + 2 direct terms are cheaper than coarse + fine, the
    pyramid path must return the direct shifts result bit-for-bit."""
    img = rng.random((1, 12, 24, 2)).astype(np.float32)
    flow = ((rng.random((1, 12, 24, 2)) - 0.5) * 6).astype(np.float32)
    s = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="shifts", max_flow=4))(
            jnp.asarray(img), jnp.asarray(flow)))
    p = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="pyramid", max_flow=4))(
            jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_array_equal(s, p)


def test_pyramid_impl_differentiable(rng):
    img = jnp.asarray(rng.random((1, 16, 16, 1), np.float32))
    flow = jnp.asarray(
        ((rng.random((1, 16, 16, 2)) - 0.5) * 12).astype(np.float32))
    tgt = jnp.asarray(rng.random((1, 16, 16, 1), np.float32))

    def loss(im, fl):
        return jnp.mean(
            (backward_warp(im, fl, impl="pyramid", max_flow=16) - tgt) ** 2)

    gi, gf = jax.jit(jax.grad(loss, argnums=(0, 1)))(img, flow)
    assert np.isfinite(np.asarray(gi)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).max()) > 0


def test_pyramid_impl_border_replicate(rng):
    img = jnp.asarray(rng.random((1, 8, 40, 1), np.float32))
    flow = jnp.zeros((1, 8, 40, 2)).at[..., 0].set(13.0)
    out = np.asarray(jax.jit(
        lambda i, f: backward_warp(i, f, impl="pyramid", max_flow=16))(
            img, flow))
    a = np.asarray(img)
    np.testing.assert_allclose(out[0, :, :27], a[0, :, 13:], atol=1e-5)
    edge = np.broadcast_to(a[0, :, 39:40], out[0, :, 27:].shape)
    np.testing.assert_allclose(out[0, :, 27:], edge, atol=1e-5)
