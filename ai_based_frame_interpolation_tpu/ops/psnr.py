"""On-device PSNR (reference uses skimage ``peak_signal_noise_ratio`` on uint8
with ``data_range=255``, ``model/evaluation_simple.py:103-106``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(img1: jax.Array, img2: jax.Array, data_range: float = 255.0) -> jax.Array:
    """Batched PSNR in dB. [N,H,W,C] -> [N]; [H,W,C] -> scalar."""
    squeeze = img1.ndim == 3
    if squeeze:
        img1, img2 = img1[None], img2[None]
    x = img1.astype(jnp.float32)
    y = img2.astype(jnp.float32)
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    out = 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))
    return out[0] if squeeze else out
