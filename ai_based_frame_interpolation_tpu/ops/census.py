"""Soft census-transform loss — an illumination-robust structure term.

The census transform encodes each pixel by the SIGN of its difference to
every neighbor in a window, so it is invariant to monotonic per-frame
brightness/gain changes; matching census descriptors instead of raw
intensities is the standard robust data term in the unsupervised-flow and
frame-synthesis literature (Meister et al., UnFlow AAAI'18 eq. 5; used by
DDFlow, SelFlow, RIFE-variant training recipes). This is a training-loss
superset of the reference (its loss is 0.5*MSE + 0.5*(1-SSIM) only,
``/root/reference/model/train.py:75-87``); off by default.

TPU notes: the transform is ``window**2 - 1`` statically-unrolled shifted
slices of an edge-padded copy — pure fused VPU elementwise work, no
gathers — and the soft sign/Hamming keep it differentiable end-to-end.
Compute in f32 (the normalizations divide small numbers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def census_transform(x: jax.Array, window: int = 7,
                     eps: float = 0.81) -> jax.Array:
    """Soft census descriptor per pixel: [B,H,W,C] -> [B,H,W,window**2-1].

    ``x`` in [-1, 1]; multi-channel inputs are reduced to luminance first
    (census is a structure descriptor, not a color one). Each descriptor
    component is ``d / sqrt(eps + d^2)`` — a soft sign of the neighbor
    difference (UnFlow's formulation; eps=0.81 ~ (0.9 intensity levels)^2
    at the [-1,1]*127.5 scale keeps tiny noise differences near 0).
    """
    if window % 2 == 0 or window < 3:
        raise ValueError(f"census window must be odd >= 3, got {window}")
    x = x.astype(jnp.float32)
    if x.shape[-1] > 1:
        x = jnp.mean(x, axis=-1, keepdims=True)
    # census literature works on ~[0, 255] intensities; rescale so eps
    # means "intensity levels" as in UnFlow
    x = (x + 1.0) * 127.5
    p = window // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")
    h, w = x.shape[1], x.shape[2]
    comps = []
    for dy in range(window):
        for dx in range(window):
            if dy == p and dx == p:
                continue
            d = xp[:, dy:dy + h, dx:dx + w, :] - x
            comps.append(d * jax.lax.rsqrt(eps + d * d))
    return jnp.concatenate(comps, axis=-1)


def census_loss(pred: jax.Array, gt: jax.Array, window: int = 7) -> jax.Array:
    """Mean soft Hamming distance between census descriptors.

    Border rows/cols whose windows read the replicate padding are excluded
    from the mean. Scalar in [0, 1); 0 iff the two images have identical
    local structure (any per-frame brightness offset/gain included).
    """
    t1 = census_transform(pred, window)
    t2 = census_transform(gt, window)
    sq = (t1 - t2) ** 2
    ham = sq / (0.1 + sq)          # soft Hamming (UnFlow eq. 5)
    p = window // 2
    return jnp.mean(ham[:, p:-p, p:-p, :])
