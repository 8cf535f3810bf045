"""Fused Pallas SSIM kernel (skimage semantics) for batched on-device eval.

The XLA path (``ops/ssim.py:ssim_eval``) lowers to 10 separable depthwise
convolutions plus an elementwise chain — each a full HBM round trip over the
image. This kernel keeps one image pair resident in VMEM and produces the
per-image SSIM scalar in a single pass: the 7x7 uniform-window sums are 14
shifted adds on the VPU, the SSIM algebra is fused, and only two uint8 images
ever cross HBM.

Scope: per-image grid (one image pair per program), uint8 inputs, C=1
(grayscale eval — the reference's metric path, ``evaluation_simple.py:103-109``).
Images must fit VMEM (~<= 720p grayscale); ``ssim_eval_auto`` dispatches to
the XLA path otherwise. Matches the XLA implementation to ~1e-5 (tested in
``tests/test_pallas_ssim.py``, interpret mode on CPU + compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

WIN = 7
_VMEM_IMAGE_LIMIT_BYTES = 1300 * 760  # whole-pair-in-VMEM cutoff (~720p gray)


def _window_sums(x, win: int):
    """[H, W] -> [H-win+1, W-win+1] sliding-window sums via shifted adds."""
    h, w = x.shape
    rows = x[:, 0:w - win + 1]
    for d in range(1, win):
        rows = rows + x[:, d:w - win + 1 + d]
    out = rows[0:h - win + 1, :]
    for d in range(1, win):
        out = out + rows[d:h - win + 1 + d, :]
    return out


def _ssim_kernel(x_ref, y_ref, o_ref, *, data_range: float):
    x = x_ref[0].astype(jnp.float32)
    y = y_ref[0].astype(jnp.float32)
    n = float(WIN * WIN)
    sx = _window_sums(x, WIN)
    sy = _window_sums(y, WIN)
    sxx = _window_sums(x * x, WIN)
    syy = _window_sums(y * y, WIN)
    sxy = _window_sums(x * y, WIN)
    ux = sx / n
    uy = sy / n
    cov_norm = 1.0 / (n - 1.0)
    vx = (sxx - sx * ux) * cov_norm
    vy = (syy - sy * uy) * cov_norm
    vxy = (sxy - sx * uy) * cov_norm
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    o_ref[0, 0] = jnp.mean(s)


@functools.partial(jax.jit, static_argnames=("data_range", "interpret"))
def ssim_eval_fused(img1: jax.Array, img2: jax.Array,
                    data_range: float = 255.0,
                    interpret: bool = False) -> jax.Array:
    """[B,H,W,1] (or [B,H,W]) pairs -> [B] SSIM, one fused pass per image."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if img1.ndim == 4:
        img1 = img1[..., 0]
        img2 = img2[..., 0]
    b, h, w = img1.shape
    out = pl.pallas_call(
        functools.partial(_ssim_kernel, data_range=data_range),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=interpret,
    )(img1, img2)
    return out[:, 0]


def fits_vmem(shape) -> bool:
    """Whole-pair-in-VMEM eligibility for the fused kernel."""
    h, w, c = shape[-3], shape[-2], shape[-1]
    return c == 1 and h * w <= _VMEM_IMAGE_LIMIT_BYTES


def ssim_eval_auto(img1, img2, data_range: float = 255.0):
    """Fused Pallas kernel when eligible (TPU, grayscale, fits VMEM);
    otherwise the XLA separable path. Same numerics either way."""
    from ..ssim import ssim_eval

    arr1 = jnp.asarray(img1)
    use_pallas = (arr1.ndim == 4 and arr1.shape[-1] == 1 and
                  fits_vmem(arr1.shape) and
                  jax.devices()[0].platform not in ("cpu",))
    if use_pallas:
        try:
            return ssim_eval_fused(arr1, jnp.asarray(img2),
                                   data_range=data_range)
        except Exception:   # unsupported platform/layout -> XLA fallback
            pass
    return ssim_eval(img1, img2, data_range=data_range)
