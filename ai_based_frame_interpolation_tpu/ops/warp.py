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


def _accumulate_chunked(terms, term_fn, like: jax.Array) -> jax.Array:
    """Sum ``term_fn(k) for k in terms`` with the chained-barrier schedule.

    XLA's fusion quality degrades sharply past ~40-50 accumulated terms
    (measured at 1088x1920: mf16 0.64 ms/frame but mf24 4.3 and mf32 5.0).
    8-term partial sums behind optimization_barrier restore near-linear
    scaling, and CHAINING the barrier over the running sum
    (barrier(out + part), not out + barrier(part)) serializes the
    partials so only two image-sized tensors are live at once — measured
    1.84x faster again at 1080p mf32 (1.12 vs 2.06 ms/frame marginal)
    and equal at 4K, where it also halves the warp's live memory.
    """
    if len(terms) <= 24:
        out = jnp.zeros_like(like)
        for k in terms:
            out = out + term_fn(k)
        return out
    out = jnp.zeros_like(like)
    for c0 in range(0, len(terms), 8):
        part = jnp.zeros_like(like)
        for k in terms[c0:c0 + 8]:
            part = part + term_fn(k)
        out = lax.optimization_barrier(out + part)
    return out


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

    return _accumulate_chunked(list(range(-rmax, rmax + 2)), term, img)


def _pyramid_stride(rmax: int) -> int:
    """Coarse stride minimizing total term count (~sqrt(rmax/2), >= 2)."""
    best, best_cost = 2, None
    for s in range(2, rmax + 1):
        ncoarse = -(-rmax // s)
        cost = (2 * ncoarse + 1) + (2 * (s + (s + 1) // 2) + 2)
        if best_cost is None or cost < best_cost:
            best, best_cost = s, cost
    return best


def _warp_axis_pyramid(img: jax.Array, disp: jax.Array, axis: int,
                       rmax: int, stride: int | None = None) -> jax.Array:
    """Two-level 1-D bounded warp: same semantics as ``_warp_axis_shifts``
    but with cost ~O(rmax/stride + 3*stride) instead of O(2*rmax).

    Level 1 (coarse) shifts the image by per-pixel INTEGER multiples of
    ``stride`` (nearest multiple of the displacement) — ``2*ceil(rmax/
    stride) + 1`` statically shifted copies under one-hot selects, no
    interpolation, so full resolution is preserved exactly. Level 2 (fine)
    runs the ordinary bilinear shifts warp on the coarse result with a
    small residual bound. Because the fine pass samples the COARSE image
    at ``p + r``, the coarse shift that applies there is the field's value
    at ``p + r``, not at ``p`` — naively using ``d[p] - stride*kc[p]`` as
    the residual produces ±stride banding in |r|-wide bands around the
    quantization boundaries of the coarse field. One Newton-style
    correction kills the first-order error: re-read the (1-channel, cheap)
    coarse-index field at ``p + round(r0)`` via a small select-shift and
    recompute the residual against THAT value; the fine bound grows to
    ``stride + ceil(stride/2)`` to cover a one-level coarse jump. The
    remaining error is confined to pixels where the coarse index jumps
    twice within one stride (flow gradient ~1 px/px) plus a 1-px bilinear
    blend across boundary columns — second-order, and the flow family
    trains THROUGH the warp. At rmax=32/stride=4 this is 17 + 14 image
    terms per axis vs 66 for the direct shifts warp.
    """
    if stride is None:
        stride = _pyramid_stride(rmax)
    pyr_terms = (2 * -(-rmax // stride) + 1) + (2 * (stride +
                                                     (stride + 1) // 2) + 2)
    if pyr_terms >= 2 * rmax + 2:  # small bounds: direct is cheaper
        return _warp_axis_shifts(img, disp, axis=axis, rmax=rmax)
    size = img.shape[axis]
    grid_shape = [1, 1, 1]
    grid_shape[axis] = size
    grid = jnp.arange(size, dtype=jnp.float32).reshape(grid_shape)
    pos = grid + jnp.clip(disp.astype(jnp.float32), -rmax, rmax)
    pos = jnp.clip(pos, 0.0, size - 1)
    d = pos - grid  # effective displacement, f32 [B, H, W]
    ncoarse = -(-rmax // stride)
    kc = jnp.clip(jnp.round(d / stride), -ncoarse, ncoarse).astype(jnp.int32)

    # Newton correction of the residual: kc as seen from p + round(r0)
    r0 = d - stride * kc.astype(jnp.float32)
    half = (stride + 1) // 2
    j0 = jnp.clip(jnp.round(r0), -half, half).astype(jnp.int32)
    kpad_spec = [(0, 0)] * kc.ndim
    kpad_spec[axis] = (half, half)
    kpad = jnp.pad(kc, kpad_spec, mode="edge")
    kc_at = jnp.zeros_like(kc)
    for j in range(-half, half + 1):
        kj = lax.slice_in_dim(kpad, half + j, half + j + size, axis=axis)
        kc_at = kc_at + jnp.where(j0 == j, kj, 0)
    rf = d - stride * kc_at.astype(jnp.float32)

    # coarse pass: one-hot select among strided integer shifts
    pad = [(0, 0)] * img.ndim
    pad[axis] = (ncoarse * stride, ncoarse * stride)
    padded = jnp.pad(img, pad, mode="edge")
    one = jnp.ones((), img.dtype)
    zero = jnp.zeros((), img.dtype)

    def cterm(j):
        w = jnp.where(kc == j, one, zero)
        shifted = lax.slice_in_dim(padded, (ncoarse + j) * stride,
                                   (ncoarse + j) * stride + size, axis=axis)
        return shifted * w[..., None]

    coarse = _accumulate_chunked(list(range(-ncoarse, ncoarse + 1)), cterm,
                                 img)
    # fine pass: ordinary bilinear shifts warp of the coarse image by the
    # corrected residual (bounded by one coarse jump + half a stride)
    return _warp_axis_shifts(coarse, rf, axis=axis, rmax=stride + half)


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
    impl : {"gather4", "patch", "shifts", "pyramid"}
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
        warp, so the learned field adapts to these semantics. ``pyramid``:
        the shifts warp with each 1-D pass split into a strided integer
        coarse level plus a small-bound fine level (``_warp_axis_pyramid``)
        — same semantics and displacement bound at ~O(sqrt(max_flow))
        instead of O(max_flow) shifted copies; exact where the field is
        locally smooth, with additional (trained-through) second-order
        deviation confined to coarse-quantization boundaries.
    max_flow : int
        ``shifts``/``pyramid`` only: per-axis displacement bound in pixels.
        ``shifts`` cost is linear in this bound (``2*max_flow + 2`` shifted
        copies per axis); ``pyramid`` cost is ~``2*sqrt(2*max_flow)``
        copies per axis.

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
    if impl == "pyramid":
        hx = _warp_axis_pyramid(img, flow[..., 0], axis=2, rmax=max_flow)
        return _warp_axis_pyramid(hx, flow[..., 1], axis=1, rmax=max_flow)

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
