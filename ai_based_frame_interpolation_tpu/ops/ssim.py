"""On-device SSIM — two exact variants, both jit-fused, NHWC.

The reference uses **two different SSIMs** (SURVEY.md §7 "hard parts"):

1. **Training loss** (reference ``model/train.py:18-73``): 11x11 Gaussian
   window (sigma 1.5) depthwise conv with zero ``SAME`` padding,
   population covariance, C1=0.01^2 / C2=0.03^2 (data range 1), mean over the
   whole map, returned as ``1 - ssim``.
2. **Evaluation metric** (reference ``model/evaluation_simple.py:103-109``):
   ``skimage.metrics.structural_similarity`` semantics — 7x7 **uniform**
   window, *sample* covariance (N/(N-1)), C constants scaled by
   ``data_range^2``, border crop of ``(win-1)//2``, computed on uint8 with
   ``data_range=255``.

Both are implemented here as separable depthwise convolutions: a Gaussian (or
uniform) window factorizes into two rank-1 passes, turning the 11x11 conv into
two cheap 1-D convs the TPU vector unit streams through; XLA fuses the
surrounding elementwise algebra. Golden-tested against independent oracles in
``tests/test_ssim.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def _gaussian_window_np(size: int, sigma: float) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2.0 * sigma ** 2))
    # match the reference's construction: normalize the 1-D window in f32
    g = (g / g.sum()).astype(np.float32)
    return g


def _depthwise_blur_1d(x: jax.Array, window: jax.Array, axis: int,
                       padding: str) -> jax.Array:
    """Separable 1-D depthwise convolution along a spatial axis (NHWC)."""
    c = x.shape[-1]
    k = window.shape[0]
    if axis == 1:      # H
        kernel = jnp.tile(window.reshape(k, 1, 1, 1), (1, 1, 1, c))
    else:              # W
        kernel = jnp.tile(window.reshape(1, k, 1, 1), (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1, 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)  # metric accuracy > speed


def _blur(x: jax.Array, window: jax.Array, padding: str) -> jax.Array:
    return _depthwise_blur_1d(_depthwise_blur_1d(x, window, 1, padding),
                              window, 2, padding)


def ssim_loss_map(img1: jax.Array, img2: jax.Array, window_size: int = 11,
                  sigma: float = 1.5) -> jax.Array:
    """Per-pixel SSIM map with the training-loss semantics (see module doc)."""
    img1 = img1.astype(jnp.float32)
    img2 = img2.astype(jnp.float32)
    w = jnp.asarray(_gaussian_window_np(window_size, sigma))
    mu1 = _blur(img1, w, "SAME")
    mu2 = _blur(img2, w, "SAME")
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, w, "SAME") - mu1_sq
    sigma2_sq = _blur(img2 * img2, w, "SAME") - mu2_sq
    sigma12 = _blur(img1 * img2, w, "SAME") - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return (((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) /
            ((mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)))


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Scalar mean SSIM (training-loss variant)."""
    return jnp.mean(ssim_loss_map(img1, img2, window_size, sigma))


def ssim_loss(pred: jax.Array, target: jax.Array, window_size: int = 11,
              sigma: float = 1.5) -> jax.Array:
    """``1 - SSIM`` — the differentiable loss term (reference train.py:71-73)."""
    return 1.0 - ssim(pred, target, window_size, sigma)


def combined_loss(pred: jax.Array, target: jax.Array, mse_weight: float = 0.5,
                  ssim_weight: float = 0.5, window_size: int = 11,
                  sigma: float = 1.5) -> jax.Array:
    """0.5*MSE + 0.5*(1-SSIM) (reference ``model/train.py:75-87``)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean((pred - target) ** 2)
    return mse_weight * mse + ssim_weight * ssim_loss(pred, target,
                                                      window_size, sigma)


def ssim_eval(img1: jax.Array, img2: jax.Array, data_range: float = 255.0,
              win_size: int = 7) -> jax.Array:
    """skimage-compatible SSIM, batched on device.

    Accepts [N,H,W,C] (or [H,W,C]) in any numeric dtype; computes per-image
    scalar SSIM with uniform ``win_size`` window, sample covariance and a
    border crop — numerically matching
    ``skimage.metrics.structural_similarity(im1, im2, data_range=...)`` for
    single-channel images (the reference evaluates grayscale). Returns [N]
    (or a scalar for unbatched input).
    """
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    w = jnp.full((win_size,), 1.0 / win_size, jnp.float32)
    # VALID padding == compute only fully-covered windows == skimage's crop
    ux = _blur(x, w, "VALID")
    uy = _blur(y, w, "VALID")
    uxx = _blur(x * x, w, "VALID")
    uyy = _blur(y * y, w, "VALID")
    uxy = _blur(x * y, w, "VALID")
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux * ux + uy * uy + c1) *
                                                 (vx + vy + c2))
    out = jnp.mean(s, axis=(1, 2, 3))
    return out[0] if squeeze else out
