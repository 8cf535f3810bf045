"""Bilinear resampling with exact PyTorch ``align_corners`` semantics, as matmuls.

The reference decoder upsamples with ``nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` (reference ``model/unet.py:40``) and the
host preprocessing resizes with OpenCV (``model/inference.py:29``).
``jax.image.resize`` has no ``align_corners`` mode, so numeric parity would be
lost. We implement the exact 1-D two-tap interpolation per axis, choosing the
formulation per axis by what the TPU layout makes cheap:

- **H axis: gather + lerp.** H is a major dim in XLA's NHWC layout, so row
  gathers are plain addressing; a dense H-contraction would force a relayout
  of the whole tensor (measured slower).
- **W axis: dense matmul** ``x @ M^T`` against the constant ``[out, in]``
  two-tap matrix when the input is bf16 and narrow enough
  (``_W_MATMUL_MAX_IN``). W sits on sublanes, so the contraction feeds the
  MXU with no transpose — whereas a W-gather makes XLA materialize a W-major
  transposed copy of the tensor (the dominant HBM cost of the s2d decoder).
  Wide/f32 tensors (full-res parity model, eval preprocessing) keep the
  exact-f32 gather+lerp.

Both paths are exact two-tap convex combinations (the matmul path rounds the
weights to bf16 — below uint8 output quantization), differentiable, and
shape-static.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=128)
def _linear_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out_size, in_size] row-stochastic linear interpolation matrix."""
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    if out_size == 1:
        m = np.zeros((1, in_size), np.float32)
        if align_corners:
            m[0, 0] = 1.0
        else:
            # half-pixel center of the single output maps to the input center
            c = (0.5) * in_size / out_size - 0.5
            lo = int(np.clip(np.floor(c), 0, in_size - 1))
            hi = min(lo + 1, in_size - 1)
            w = c - lo
            m[0, lo] += 1.0 - w
            m[0, hi] += w
        return m
    if align_corners:
        coords = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        coords = (np.arange(out_size, dtype=np.float64) + 0.5) * in_size / out_size - 0.5
        coords = np.clip(coords, 0.0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (coords - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo), 1.0 - w)
    np.add.at(m, (rows, hi), w)
    return m


@functools.lru_cache(maxsize=128)
def _linear_taps_np(in_size: int, out_size: int, align_corners: bool):
    """(lo[out], hi[out], w[out]): out[o] = (1-w)*x[lo] + w*x[hi].

    The exact 2-tap sparsity of 1-D linear interpolation. A dense [out, in]
    matmul formulation computes the same thing with in/2 times the FLOPs —
    at 1080p that made the decoder's upsamples cost more than every conv in
    the network combined; the gather+lerp form is a cheap bandwidth-bound
    elementwise op that XLA fuses with its consumers.
    """
    m = _linear_matrix_np(in_size, out_size, align_corners)
    lo = np.zeros(out_size, np.int32)
    hi = np.zeros(out_size, np.int32)
    w = np.zeros(out_size, np.float32)
    for o in range(out_size):
        nz = np.nonzero(m[o])[0]
        if len(nz) == 1:
            lo[o] = hi[o] = nz[0]
            w[o] = 0.0
        else:
            lo[o], hi[o] = nz[0], nz[-1]
            w[o] = m[o, hi[o]]
    return lo, hi, w


# integer-factor upsample taps: "shifts" (gather-free, the default) or
# "take" (the round-2 jnp.take formulation — kept for A/B measurement,
# scripts/resize_ab.py)
_INT_UPSAMPLE_IMPL = "shifts"


def _lerp_axis(x: jax.Array, axis: int, in_size: int, out_size: int,
               align_corners: bool) -> jax.Array:
    lo, hi, w = _linear_taps_np(in_size, out_size, align_corners)
    if (out_size % in_size == 0 and out_size > in_size
            and _INT_UPSAMPLE_IMPL == "shifts"):
        # integer upsample factor: gather-free shift+select formulation
        # (same taps/weights bit-for-bit). XLA lowers jnp.take on TPU to a
        # serialized while-loop descriptor gather — measured as the single
        # largest non-conv cost of the production 1080p dispatch (24 while
        # loops, 28 GB padded traffic, docs/hlo_attribution.json). For
        # out = s*in the two taps always sit at o//s + {-1, 0, +1}, so the
        # gather collapses to a repeat + two s-row shifts + constant-mask
        # selects — all fusible elementwise/layout ops, no descriptors.
        s = out_size // in_size
        base = np.arange(out_size) // s
        r = jnp.repeat(x, s, axis=axis)                  # r[o] = x[o//s]
        rm = jnp.concatenate(                            # r[o-s] (clamped)
            [_slice_axis(r, axis, 0, s), _slice_axis(r, axis, 0,
                                                     out_size - s)], axis)
        rp = jnp.concatenate(                            # r[o+s] (clamped)
            [_slice_axis(r, axis, s, out_size),
             _slice_axis(r, axis, out_size - s, out_size)], axis)
        shape = [1] * x.ndim
        shape[axis] = out_size

        def pick(off):
            off = np.asarray(off)
            sel_m = jnp.asarray(off == -1).reshape(shape)
            sel_p = jnp.asarray(off == 1).reshape(shape)
            return jnp.where(sel_m, rm, jnp.where(sel_p, rp, r))

        x_lo = pick(lo - base)
        x_hi = pick(hi - base)
    else:
        x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
        x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
        shape = [1] * x.ndim
        shape[axis] = out_size
    # bf16 inputs lerp in bf16: the f32 intermediate DOUBLES the decoder's
    # resize traffic (docs/hlo_attribution.json: the up4 f32->bf16 convert
    # fusion alone moved 8.6 GB/dispatch at 1080p b128). Weight rounding to
    # bf16 errs <= 2^-9 of the local pixel delta — the same tolerance the
    # W-matmul path already accepts, far below uint8 output quantization.
    # f32/other inputs keep the exact-f32 lerp (torch-parity golden path).
    acc = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    wb = jnp.asarray(w).astype(acc).reshape(shape)
    out = x_lo.astype(acc) * (jnp.asarray(1.0, acc) - wb) \
        + x_hi.astype(acc) * wb
    return out.astype(x.dtype)


def _slice_axis(x: jax.Array, axis: int, start: int, stop: int) -> jax.Array:
    idx = [slice(None)] * x.ndim
    idx[axis] = slice(start, stop)
    return x[tuple(idx)]


# Max contraction width for the W-axis matmul formulation. Above this the
# dense [out, in] product's FLOPs outgrow the relayout traffic it avoids
# (full-res parity keeps the gather); below it (every s2d model level) the
# matmul is the clear win: the W dim sits on sublanes in XLA's NHWC layout,
# so contracting it feeds the MXU with NO transpose, while a W-gather makes
# XLA materialize a W-major transposed copy of the whole tensor (measured at
# 1080p s2d=4: core 2.65 -> 2.06 ms/midpoint, traffic 1.74 -> 1.58 GB/mid).
# The H-axis is the opposite: H is a major dim, so row gathers are cheap and
# an H-contraction would force the relayout instead — H always uses lerp.
_W_MATMUL_MAX_IN = 512


def _wmat_axis(x: jax.Array, in_size: int, out_size: int,
               align_corners: bool) -> jax.Array:
    """W-axis resize as ``x @ M^T`` on the MXU (bf16, f32 accumulation).

    Numerically this computes the same two-tap convex combination as
    :func:`_lerp_axis` with the weights rounded to bf16 (error <= 2^-9 of
    the local pixel delta — far below uint8 output quantization; the f32
    path keeps the exact lerp for the golden torch-parity tests).
    """
    m = jnp.asarray(_linear_matrix_np(in_size, out_size, align_corners),
                    x.dtype)
    return jnp.einsum("bhwc,ow->bhoc", x, m,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def resize_bilinear(
    x: jax.Array,
    out_hw: Tuple[int, int],
    align_corners: bool = True,
    precision=None,  # kept for API compat; the lerp path has no matmuls
) -> jax.Array:
    """Bilinear-resize an NHWC (or HWC) image tensor to ``out_hw``.

    Matches ``torch.nn.functional.interpolate(mode='bilinear',
    align_corners=...)`` bit-for-bit at f32 (golden-tested in
    ``tests/test_resize.py``). Implemented as per-axis gather + lerp in f32.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    if x.ndim != 4:
        raise ValueError(f"expected NHWC or HWC, got shape {x.shape}")
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    w_matmul = x.dtype == jnp.bfloat16 and w_in <= _W_MATMUL_MAX_IN
    if w_in != w_out and w_matmul:
        # W first: the matmul contracts at the not-yet-upsampled row count
        x = _wmat_axis(x, w_in, w_out, align_corners)
    if h_in != h_out:
        x = _lerp_axis(x, 1, h_in, h_out, align_corners)
    if w_in != w_out and not w_matmul:
        x = _lerp_axis(x, 2, w_in, w_out, align_corners)
    return x[0] if squeeze else x


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """The decoder's x2 bilinear upsample (reference ``model/unet.py:40``)."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners=True)


def upsample2x_half_pixel(x: jax.Array) -> jax.Array:
    """x2 bilinear upsample with half-pixel centers, NHWC (TPU-native).

    Matches ``torch.nn.functional.interpolate(scale_factor=2,
    mode='bilinear', align_corners=False)``: shift-invariant two-tap rows
    ``out[2i] = 0.25 x[i-1] + 0.75 x[i]`` and ``out[2i+1] = 0.75 x[i] +
    0.25 x[i+1]`` (edge-clamped). Unlike ``align_corners=True`` (whose
    per-output weights drift with position and therefore need gather or a
    dense matrix), this needs only single-row shifts + an interleave:

    - W axis: the constant-matrix MXU contraction (no transpose, W is on
      sublanes) when bf16 and narrow, else shift+lerp+interleave;
    - H axis: shift+lerp+interleave — H is a major dim, so the shifts are
      pure addressing and the (h,2)->2h merge is layout-free. No gather at
      all, which removes the H-gather's transposed copies from the decoder.

    This is the ``ModelConfig(upsample="half_pixel")`` decoder — a training-
    time architecture choice (new checkpoints), not numerically compatible
    with reference ``nn.Upsample(align_corners=True)`` weights.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    b, h, w, c = x.shape

    if x.dtype == jnp.bfloat16 and w <= _W_MATMUL_MAX_IN:
        x = _wmat_axis(x, w, 2 * w, align_corners=False)
    else:
        xm = jnp.concatenate([x[:, :, :1], x[:, :, :-1]], axis=2)
        xp = jnp.concatenate([x[:, :, 1:], x[:, :, -1:]], axis=2)
        e = 0.25 * xm.astype(jnp.float32) + 0.75 * x.astype(jnp.float32)
        o = 0.75 * x.astype(jnp.float32) + 0.25 * xp.astype(jnp.float32)
        x = jnp.stack([e, o], axis=3).reshape(b, h, 2 * w, c).astype(x.dtype)

    xm = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    xp = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    e = 0.25 * xm.astype(jnp.float32) + 0.75 * x.astype(jnp.float32)
    o = 0.75 * x.astype(jnp.float32) + 0.25 * xp.astype(jnp.float32)
    x = jnp.stack([e, o], axis=2).reshape(b, 2 * h, 2 * w, c).astype(x.dtype)
    return x[0] if squeeze else x


def pad_to_multiple(x: jax.Array, multiple: int = 16, mode: str = "edge"):
    """Pad H and W (NHWC) up to a multiple; returns (padded, (H, W)) originals.

    The U-Net has ``depth`` 2x downsamples, so spatial dims must be divisible
    by ``2**depth`` (16 by default). 1080p (1920x1080) pads to 1920x1088 once;
    shapes stay static for jit.
    """
    h, w = x.shape[-3], x.shape[-2]
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        pad = [(0, 0)] * (x.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        x = jnp.pad(x, pad, mode=mode)
    return x, (h, w)


def crop_to(x: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Undo :func:`pad_to_multiple`."""
    h, w = hw
    return x[..., :h, :w, :]
