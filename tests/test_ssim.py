"""Golden tests for SSIM/PSNR against independent oracles.

- Training-loss SSIM vs a torch oracle implementing the reference formula
  (11x11 Gaussian depthwise conv, zero SAME pad — ``model/train.py:18-73``).
- Eval SSIM vs a naive sliding-window numpy oracle implementing skimage
  ``structural_similarity`` semantics (7x7 uniform window, sample covariance,
  border crop) — skimage itself is not installed in this image.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.ops.psnr import psnr
from ai_based_frame_interpolation_tpu.ops.ssim import (
    combined_loss, ssim, ssim_eval, ssim_loss)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

def torch_ssim_oracle(a_nhwc, b_nhwc, window_size=11, sigma=1.5):
    """The reference training-SSIM formula, written independently with torch."""
    import torch.nn.functional as F

    a = torch.from_numpy(np.asarray(a_nhwc, np.float32)).permute(0, 3, 1, 2)
    b = torch.from_numpy(np.asarray(b_nhwc, np.float32)).permute(0, 3, 1, 2)
    c = a.shape[1]
    xs = torch.arange(window_size, dtype=torch.float32)
    g = torch.exp(-((xs - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    win2d = torch.outer(g, g).expand(c, 1, window_size, window_size).contiguous()
    pad = window_size // 2

    def blur(t):
        return F.conv2d(t, win2d, padding=pad, groups=c)

    mu1, mu2 = blur(a), blur(b)
    s11 = blur(a * a) - mu1 * mu1
    s22 = blur(b * b) - mu2 * mu2
    s12 = blur(a * b) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s11 + s22 + c2))
    return float(smap.mean())


def numpy_skimage_ssim_oracle(a_hw, b_hw, data_range=255.0, win=7):
    """Direct sliding-window skimage-semantics SSIM on a 2-D image (slow)."""
    a = np.asarray(a_hw, np.float64)
    b = np.asarray(b_hw, np.float64)
    h, w = a.shape
    n = win * win
    cov_norm = n / (n - 1)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for i in range(h - win + 1):
        for j in range(w - win + 1):
            pa = a[i:i + win, j:j + win]
            pb = b[i:i + win, j:j + win]
            ux, uy = pa.mean(), pb.mean()
            vx = cov_norm * (np.mean(pa * pa) - ux * ux)
            vy = cov_norm * (np.mean(pb * pb) - uy * uy)
            vxy = cov_norm * (np.mean(pa * pb) - ux * uy)
            vals.append(((2 * ux * uy + c1) * (2 * vxy + c2)) /
                        ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def _pair(rng, shape=(2, 32, 32, 1)):
    a = rng.random(shape, dtype=np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(shape).astype(np.float32), 0, 1)
    return a, b


def test_train_ssim_matches_torch_oracle(rng):
    a, b = _pair(rng)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch_ssim_oracle(a, b)
    assert abs(ours - theirs) < 5e-4


def test_train_ssim_multichannel(rng):
    a, b = _pair(rng, (1, 24, 24, 3))
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    theirs = torch_ssim_oracle(a, b)
    assert abs(ours - theirs) < 5e-4


def test_ssim_identical_is_one(rng):
    a, _ = _pair(rng)
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(a))) - 1.0) < 1e-5
    assert float(ssim_loss(jnp.asarray(a), jnp.asarray(a))) < 1e-5


def test_combined_loss_weights(rng):
    a, b = _pair(rng)
    full = float(combined_loss(jnp.asarray(a), jnp.asarray(b)))
    mse = float(np.mean((a - b) ** 2))
    sl = float(ssim_loss(jnp.asarray(a), jnp.asarray(b)))
    assert abs(full - (0.5 * mse + 0.5 * sl)) < 1e-6


def test_eval_ssim_matches_skimage_semantics(rng):
    a = (rng.random((20, 20)) * 255).astype(np.uint8)
    noise = rng.integers(-20, 20, (20, 20))
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    ours = float(ssim_eval(jnp.asarray(a[..., None]), jnp.asarray(b[..., None])))
    oracle = numpy_skimage_ssim_oracle(a, b)
    assert abs(ours - oracle) < 5e-4


def test_eval_ssim_batched(rng):
    a = (rng.random((3, 16, 16, 1)) * 255).astype(np.uint8)
    b = (rng.random((3, 16, 16, 1)) * 255).astype(np.uint8)
    batched = np.asarray(ssim_eval(jnp.asarray(a), jnp.asarray(b)))
    singles = [float(ssim_eval(jnp.asarray(a[i]), jnp.asarray(b[i])))
               for i in range(3)]
    np.testing.assert_allclose(batched, singles, atol=1e-6)


def test_psnr_known_value():
    a = np.zeros((8, 8, 1), np.uint8)
    b = np.full((8, 8, 1), 10, np.uint8)
    # mse = 100 -> psnr = 10*log10(255^2/100)
    expect = 10 * np.log10(255.0 ** 2 / 100.0)
    assert abs(float(psnr(jnp.asarray(a), jnp.asarray(b))) - expect) < 1e-3


def test_psnr_identical_is_large():
    a = np.full((8, 8, 1), 7, np.uint8)
    assert float(psnr(jnp.asarray(a), jnp.asarray(a))) > 100


def test_ssim_loss_is_differentiable(rng):
    import jax

    a, b = _pair(rng, (1, 16, 16, 1))
    g = jax.grad(lambda x: ssim_loss(x, jnp.asarray(b)))(jnp.asarray(a))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
