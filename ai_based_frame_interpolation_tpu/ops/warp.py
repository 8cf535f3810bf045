"""Differentiable backward warping (bilinear resampling by a flow field).

The reference's only use of warping is the host-side Farneback baseline
(reference ``model/evaluation.py:142-192``: ``cv2.remap`` of frame1 by half
the dense flow, border-replicate). This module provides the on-device,
differentiable equivalent that the learned flow model family
(``models/flow.py``) trains through end-to-end.

TPU notes: the four corner fetches lower to XLA gathers over a flattened
``[B, H*W, C]`` view — gathers are not an MXU workload, but at the flow
family's operating points (one warp pair per output frame) they are a small
fraction of the backbone cost. Coordinate arithmetic runs in f32 (bf16 has
only 8 mantissa bits — pixel indices above 256 would quantize); the blend
weights are applied in the image dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def backward_warp(img: jax.Array, flow: jax.Array,
                  impl: str = "gather4") -> jax.Array:
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
    impl : {"gather4", "patch"}
        ``gather4``: four independent 1-element gathers over a flattened
        [B, H*W, C] view (one per bilinear corner). ``patch``: ONE gather of
        2x2xC slices — 4x fewer gather descriptors for the memory system to
        chase; numerically identical (both clamp coordinates to the
        replicate border before taking the fractional part).

    Returns
    -------
    [B, H, W, C] warped image, in ``img``'s dtype.
    """
    b, h, w, c = img.shape
    if h < 2 or w < 2:
        raise ValueError(f"backward_warp needs H, W >= 2, got {(h, w)}")
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
