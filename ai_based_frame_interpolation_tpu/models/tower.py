"""Feature-tower interpolator — the second model family (capability superset).

The reference architecture concatenates both frames at the input
(``model/unet.py:105-112``), which makes per-frame computation inseparable: a
video stream recomputes everything for every pair even though consecutive
pairs share a frame. This family splits the network into

- a **shared frame encoder** (siamese: same parameters applied to each frame)
  producing a feature pyramid per frame, and
- a **fusion decoder** that combines the two pyramids scale-by-scale and
  regresses the midpoint.

For a streaming 2x video pipeline each frame is encoded ONCE and its pyramid
reused by both adjacent pairs (``InterpolationEngine.interpolate_video_frames``
slices a batched encode — zero recompute), cutting steady-state compute by
the encoder's share of FLOPs. Time-conditioning attaches naturally at the
fused bottleneck, so one trained model samples any t in (0,1).

Blocks reuse the U-Net's DoubleConv (same conv/bn naming, so BatchNorm
folding and the checkpointing machinery work unchanged).
"""

from __future__ import annotations

from typing import Any, List, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.resize import upsample2x_align_corners, upsample2x_half_pixel
from .unet import DoubleConv, depth_to_space, space_to_depth

Dtype = Any


class FrameEncoder(nn.Module):
    """Per-frame feature pyramid: widths w, 2w, ..., with a halved bottleneck
    (mirrors the U-Net encoder at half width so the fused decoder sees the
    same channel counts as the reference architecture)."""

    base_width: int = 32
    depth: int = 4
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> List[jax.Array]:
        w = self.base_width
        feats = [DoubleConv(w, compute_dtype=self.compute_dtype,
                            folded=self.folded, name="inc")(x, train)]
        for i in range(1, self.depth + 1):
            ch = w * (2 ** i)
            if i == self.depth:
                ch //= 2
            y = nn.max_pool(feats[-1], (2, 2), strides=(2, 2))
            feats.append(DoubleConv(ch, compute_dtype=self.compute_dtype,
                                    folded=self.folded,
                                    name=f"down{i}")(y, train))
        return feats


class FusionDecoder(nn.Module):
    """Scale-wise fusion (concat) of two pyramids + U-Net-style decoding.

    With ``slim=True`` each fused (concatenated) skip is projected back to
    per-frame encoder width by a 1x1 conv before the decoder consumes it:
    the plain concat doubles every decoder width, and at high resolution the
    decoder is HBM-bandwidth-bound, so halving its widths ~halves its
    traffic while the 1x1 projections are MXU-cheap.
    """

    out_channels: int = 1
    base_width: int = 32
    depth: int = 4
    time_conditioned: bool = False
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False
    slim: bool = False
    upsample: str = "align_corners"

    @nn.compact
    def __call__(self, feats1: List[jax.Array], feats2: List[jax.Array],
                 t: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        fused = [jnp.concatenate([a, b], axis=-1)
                 for a, b in zip(feats1, feats2)]
        if self.slim:
            fused = [nn.relu(nn.Conv(f.shape[-1] // 2, (1, 1), use_bias=True,
                                     dtype=self.compute_dtype,
                                     name=f"proj{j}")(f))
                     for j, f in enumerate(fused)]
        y = fused[-1]
        if self.time_conditioned:
            if t is None:
                t = jnp.full((y.shape[0],), 0.5, jnp.float32)
            tmap = jnp.broadcast_to(
                t[:, None, None, None].astype(y.dtype),
                (*y.shape[:-1], 1))
            y = jnp.concatenate([y, tmap], axis=-1)
        # fused widths match the ref U-Net; slim halves them back
        w2 = self.base_width * (1 if self.slim else 2)
        for i in range(1, self.depth + 1):
            ch = w2 * (2 ** (self.depth - i))
            if i < self.depth:
                ch //= 2
            if self.upsample == "half_pixel":
                y = upsample2x_half_pixel(y)
            else:
                y = upsample2x_align_corners(y)
            skip = fused[self.depth - i]
            dh = skip.shape[-3] - y.shape[-3]
            dw = skip.shape[-2] - y.shape[-2]
            if dh or dw:
                pad = [(0, 0)] * (y.ndim - 3) + [
                    (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)]
                y = jnp.pad(y, pad)
            cat = jnp.concatenate([skip, y.astype(skip.dtype)], axis=-1)
            y = DoubleConv(ch, mid_ch=cat.shape[-1] // 2,
                           compute_dtype=self.compute_dtype,
                           folded=self.folded, name=f"up{i}")(cat, train)
        return nn.Conv(self.out_channels, (1, 1), use_bias=True,
                       dtype=jnp.float32, name="outc")(y.astype(jnp.float32))


class TowerInterpolator(nn.Module):
    """Drop-in alternative to ``FrameInterpolationUNet`` (same call
    signature), plus separable ``encode``/``decode`` methods the engine uses
    for feature reuse across video pairs."""

    cfg: ModelConfig = ModelConfig(arch="tower")
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False

    def setup(self):
        r = self.cfg.space_to_depth
        self.encoder = FrameEncoder(base_width=self.cfg.base_width // 2,
                                    depth=self.cfg.depth,
                                    compute_dtype=self.compute_dtype,
                                    folded=self.folded)
        self.decoder = FusionDecoder(out_channels=self.cfg.channels * r * r,
                                     base_width=self.cfg.base_width // 2,
                                     depth=self.cfg.depth,
                                     time_conditioned=self.cfg.time_conditioned,
                                     compute_dtype=self.compute_dtype,
                                     folded=self.folded,
                                     slim=self.cfg.slim_decoder,
                                     upsample=getattr(
                                         self.cfg, "upsample",
                                         "align_corners"))
        if self.cfg.refine_width > 0 and r > 1:
            g = self.cfg.refine_factor
            if r % g:
                raise ValueError(
                    f"refine_factor {g} must divide space_to_depth {r}")
            w = self.cfg.refine_width
            self.refine1 = nn.Conv(w, (3, 3), padding="SAME",
                                   dtype=self.compute_dtype, name="refine1")
            self.refine2 = nn.Conv(w, (3, 3), padding="SAME",
                                   dtype=self.compute_dtype, name="refine2")
            self.refine_out = nn.Conv(self.cfg.channels * g * g, (1, 1),
                                      dtype=jnp.float32, name="refine_out")

    def encode(self, frame: jax.Array, train: bool = False) -> List[jax.Array]:
        r = self.cfg.space_to_depth
        x = space_to_depth(frame, r).astype(self.compute_dtype) if r > 1 \
            else frame.astype(self.compute_dtype)
        return self.encoder(x, train)

    def decode(self, feats1: List[jax.Array], feats2: List[jax.Array],
               f1: jax.Array, f2: jax.Array,
               t: Optional[jax.Array] = None,
               train: bool = False) -> jax.Array:
        r = self.cfg.space_to_depth
        y = self.decoder(feats1, feats2, t=t, train=train)
        if self.cfg.residual:
            mid = 0.5 * (space_to_depth(f1, r) + space_to_depth(f2, r)) \
                if r > 1 else 0.5 * (f1 + f2)
            y = y + mid.astype(y.dtype)
        if self.cfg.refine_width > 0 and r > 1:
            # same refinement head as the U-Net family (models/unet.py),
            # at rearrange factor g = cfg.refine_factor (1 = full res,
            # r = fully s2d; see config.py for the speed/quality trade)
            g = self.cfg.refine_factor
            cdt = self.compute_dtype
            yg = depth_to_space(y, r // g)       # y is in r-space here
            z = jnp.concatenate([yg.astype(cdt),
                                 space_to_depth(f1, g).astype(cdt),
                                 space_to_depth(f2, g).astype(cdt)], axis=-1)
            z = nn.relu(self.refine1(z))
            z = nn.relu(self.refine2(z))
            yg = yg + self.refine_out(z.astype(jnp.float32))
            # compute-dtype materialization: see models/unet.py (f32 C=1
            # full-res tensors can get 128x lane padding at 4x recursion)
            return depth_to_space(yg.astype(self.compute_dtype), g)
        return depth_to_space(y, r)

    def __call__(self, frame1: jax.Array, frame2: jax.Array,
                 t: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        feats1 = self.encode(frame1, train)
        feats2 = self.encode(frame2, train)
        return self.decode(feats1, feats2, frame1, frame2, t=t, train=train)
