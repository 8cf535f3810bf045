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


def backward_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
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

    Returns
    -------
    [B, H, W, C] warped image, in ``img``'s dtype.
    """
    b, h, w, c = img.shape
    cdt = jnp.float32  # coordinate dtype: see module docstring
    x = jnp.arange(w, dtype=cdt)[None, None, :] + flow[..., 0].astype(cdt)
    y = jnp.arange(h, dtype=cdt)[None, :, None] + flow[..., 1].astype(cdt)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx = (x - x0f)[..., None].astype(img.dtype)
    wy = (y - y0f)[..., None].astype(img.dtype)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)

    flat = img.reshape(b, h * w, c)

    def fetch(yy, xx):
        idx = (yy * w + xx).reshape(b, h * w, 1)
        return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, c)

    top = fetch(y0, x0) * (1 - wx) + fetch(y0, x1) * wx
    bot = fetch(y1, x0) * (1 - wx) + fetch(y1, x1) * wx
    return top * (1 - wy) + bot * wy
