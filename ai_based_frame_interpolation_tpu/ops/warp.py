"""Differentiable backward warping (bilinear resampling by a flow field).

The reference's only use of warping is the host-side Farneback baseline
(reference ``model/evaluation.py:142-192``: ``cv2.remap`` of frame1 by half
the dense flow, border-replicate). This module provides the on-device,
differentiable equivalent that the learned flow model family
(``models/flow.py``) trains through end-to-end.

TPU notes: the four corner fetches lower to XLA gathers over a flattened
``[B, H*W, C]`` view. Per-element gathers are a pathological TPU workload —
measured ~110 ms/frame at 1080p (the memory system chases one descriptor per
pixel per corner), which made the flow family 50x slower than the U-Net
production config at that resolution. The ``shifts`` implementation removes
the gathers entirely: a separable two-pass warp where each 1-D pass is a sum
of ``2*max_flow + 2`` statically shifted, edge-padded copies weighted by
per-pixel selects — pure vector work that XLA fuses, at a cost linear in the
displacement bound instead of in descriptor chasing. Coordinate arithmetic
runs in f32 (bf16 has only 8 mantissa bits — pixel indices above 256 would
quantize); the blend weights are applied in the image dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _warp_axis_shifts(img: jax.Array, disp: jax.Array, axis: int,
                      rmax: int) -> jax.Array:
    """1-D bounded-displacement bilinear warp along ``axis`` (1=H, 2=W).

    ``out[p] = img[p + clip(disp[p], -rmax, rmax)]`` (border-replicated,
    linearly interpolated), computed WITHOUT gathers: the image is edge-
    padded once, and the output is the sum over the ``2*rmax + 2`` static
    shift offsets ``k`` of ``shifted_k * weight_k`` where ``weight_k`` is
    the per-pixel bilinear weight selecting that offset (nonzero for at
    most two offsets per pixel). Static slices + selects + FMAs only —
    everything the TPU vector unit streams at full rate.
    """
    size = img.shape[axis]
    grid_shape = [1, 1, 1]  # disp is [B, H, W]; img axis 1/2 -> disp axis 1/2
    grid_shape[axis] = size
    grid = jnp.arange(size, dtype=jnp.float32).reshape(grid_shape)
    pos = grid + jnp.clip(disp.astype(jnp.float32), -rmax, rmax)
    pos = jnp.clip(pos, 0.0, size - 1)  # replicate border
    k0 = jnp.floor(pos).astype(jnp.int32)
    frac = (pos - k0.astype(jnp.float32)).astype(img.dtype)
    rel = k0 - grid.astype(jnp.int32)  # in [-rmax, rmax] by construction
    pad = [(0, 0)] * img.ndim
    pad[axis] = (rmax, rmax + 1)
    padded = jnp.pad(img, pad, mode="edge")
    one = jnp.ones((), img.dtype)
    zero = jnp.zeros((), img.dtype)

    def term(k):
        w = (jnp.where(rel == k, one - frac, zero)
             + jnp.where(rel == k - 1, frac, zero))
        shifted = lax.slice_in_dim(padded, rmax + k, rmax + k + size,
                                   axis=axis)
        return shifted * w[..., None]

    terms = list(range(-rmax, rmax + 2))
    # XLA's fusion quality degrades sharply past ~40-50 accumulated terms
    # (measured at 1088x1920: mf16 0.64 ms/frame but mf24 4.3 and mf32 5.0).
    # 8-term partial sums behind optimization_barrier restore near-linear
    # scaling, and CHAINING the barrier over the running sum
    # (barrier(out + part), not out + barrier(part)) serializes the
    # partials so only two image-sized tensors are live at once — measured
    # 1.84x faster again at 1080p mf32 (1.12 vs 2.06 ms/frame marginal)
    # and equal at 4K, where it also halves the warp's live memory.
    if len(terms) <= 24:
        out = jnp.zeros_like(img)
        for k in terms:
            out = out + term(k)
        return out
    out = jnp.zeros_like(img)
    for c0 in range(0, len(terms), 8):
        part = jnp.zeros_like(img)
        for k in terms[c0:c0 + 8]:
            part = part + term(k)
        out = lax.optimization_barrier(out + part)
    return out


def backward_warp(img: jax.Array, flow: jax.Array,
                  impl: str = "gather4", max_flow: int = 32) -> jax.Array:
    """Sample ``img`` at ``x + flow`` with bilinear interpolation.

    Parameters
    ----------
    img : [B, H, W, C]
        Source image (any float dtype).
    flow : [B, H, W, 2]
        Displacement field in pixels; channel 0 is the x (width)
        displacement, channel 1 the y (height) displacement — the same
        (dx, dy) convention as the Farneback baseline (``ops/flow.py``).
        The output at grid position (y, x) is ``img[y + dy, x + dx]``,
        bilinearly interpolated, border-replicated (``cv2.BORDER_REPLICATE``
        semantics of the reference baseline).
    impl : {"gather4", "patch", "shifts"}
        ``gather4``: four independent 1-element gathers over a flattened
        [B, H*W, C] view (one per bilinear corner). ``patch``: ONE gather of
        2x2xC slices — 4x fewer gather descriptors for the memory system to
        chase; numerically identical to gather4. ``shifts``: gather-free
        separable two-pass warp (x then y) built from statically shifted
        copies — the TPU-fast path. It differs from the exact 2-D warp in
        two documented ways: (a) displacements are clamped to
        ``[-max_flow, max_flow]`` pixels per axis, and (b) the x-shift is
        sampled at the source row rather than the output row, so results
        deviate only where the x-field varies across the y-displacement
        (second-order: |dy| * d(dx)/dy). The flow family trains THROUGH the
        warp, so the learned field adapts to these semantics.
    max_flow : int
        ``shifts`` only: per-axis displacement bound in pixels. Cost is
        linear in this bound (``2*max_flow + 2`` shifted copies per axis).

    Returns
    -------
    [B, H, W, C] warped image, in ``img``'s dtype.
    """
    b, h, w, c = img.shape
    if h < 2 or w < 2:
        raise ValueError(f"backward_warp needs H, W >= 2, got {(h, w)}")
    if impl == "shifts":
        hx = _warp_axis_shifts(img, flow[..., 0], axis=2, rmax=max_flow)
        return _warp_axis_shifts(hx, flow[..., 1], axis=1, rmax=max_flow)

    cdt = jnp.float32  # coordinate dtype: see module docstring
    x = jnp.arange(w, dtype=cdt)[None, None, :] + flow[..., 0].astype(cdt)
    y = jnp.arange(h, dtype=cdt)[None, :, None] + flow[..., 1].astype(cdt)
    # Clamp to the replicate border FIRST, then split into (corner, frac):
    # out-of-range coordinates land exactly on an edge pixel with frac 0/1,
    # which is what independent per-corner clipping produces too.
    x = jnp.clip(x, 0.0, w - 1)
    y = jnp.clip(y, 0.0, h - 1)
    x0 = jnp.minimum(jnp.floor(x).astype(jnp.int32), w - 2)
    y0 = jnp.minimum(jnp.floor(y).astype(jnp.int32), h - 2)
    wx = (x - x0.astype(cdt))[..., None].astype(img.dtype)
    wy = (y - y0.astype(cdt))[..., None].astype(img.dtype)

    if impl == "patch":
        idx = jnp.stack([y0, x0], axis=-1).reshape(b, h * w, 2)
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(1, 2),
            operand_batching_dims=(0,),
            start_indices_batching_dims=(0,))
        # [B, H*W, 2, 2, C]: per output pixel the 2x2 corner neighborhood
        p = lax.gather(img, idx, dnums, slice_sizes=(1, 2, 2, c),
                       mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)
        p = p.reshape(b, h, w, 2, 2, c)
        top = p[..., 0, 0, :] * (1 - wx) + p[..., 0, 1, :] * wx
        bot = p[..., 1, 0, :] * (1 - wx) + p[..., 1, 1, :] * wx
        return top * (1 - wy) + bot * wy

    flat = img.reshape(b, h * w, c)

    def fetch(yy, xx):
        idx = (yy * w + xx).reshape(b, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1,
                                   mode="promise_in_bounds").reshape(
                                       b, h, w, c)

    x1 = x0 + 1
    y1 = y0 + 1
    top = fetch(y0, x0) * (1 - wx) + fetch(y0, x1) * wx
    bot = fetch(y1, x0) * (1 - wx) + fetch(y1, x1) * wx
    return top * (1 - wy) + bot * wy
