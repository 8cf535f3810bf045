"""Bilinear resampling with exact PyTorch ``align_corners`` semantics, as matmuls.

The reference decoder upsamples with ``nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)`` (reference ``model/unet.py:40``) and the
host preprocessing resizes with OpenCV (``model/inference.py:29``).
``jax.image.resize`` has no ``align_corners`` mode, so numeric parity would be
lost. Instead we build the 1-D linear-interpolation operator as a constant
``[out, in]`` matrix per axis and apply it as two contractions:

    y = M_h @ x @ M_w^T          (per batch/channel, NHWC via einsum)

On TPU this is the idiomatic formulation: the constant matrices are folded
into the program, the contractions tile directly onto the 128x128 MXU, and XLA
fuses the surrounding elementwise work. It is exact (each output row has at
most two non-zeros equal to the interpolation weights), differentiable, and
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


def _lerp_axis(x: jax.Array, axis: int, in_size: int, out_size: int,
               align_corners: bool) -> jax.Array:
    lo, hi, w = _linear_taps_np(in_size, out_size, align_corners)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    wb = jnp.asarray(w).reshape(shape)
    out = x_lo.astype(jnp.float32) * (1.0 - wb) + x_hi.astype(jnp.float32) * wb
    return out.astype(x.dtype)


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
    if h_in != h_out:
        x = _lerp_axis(x, 1, h_in, h_out, align_corners)
    if w_in != w_out:
        x = _lerp_axis(x, 2, w_in, w_out, align_corners)
    return x[0] if squeeze else x


def upsample2x_align_corners(x: jax.Array) -> jax.Array:
    """The decoder's x2 bilinear upsample (reference ``model/unet.py:40``)."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2), align_corners=True)


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
