"""Flow-guided interpolator — the third model family (motion-compensated).

Motivation, measured on the procedural-scene benchmark: the *classical*
optical-flow baseline (Farneback warp, capability of reference
``model/evaluation.py:142-192``) outscores the trained direct-regression
U-Net there (SSIM 0.896 vs 0.890) — content with real motion rewards motion
compensation, which the reference's architecture (concat frames -> regress
pixels, ``model/unet.py:105-112``) cannot express. This family learns it
end-to-end, in the spirit of Deep Voxel Flow (Liu et al., ICCV'17):

- a U-Net **motion backbone** consumes both frames and predicts, per pixel,
  one linear motion field ``F`` (frame1 -> frame2 displacement) and an
  occlusion/blend mask ``m``;
- a **sampler** synthesizes the frame at ANY time ``t`` in [0, 1] with two
  differentiable backward warps (``ops/warp.py``) and time-weighted
  blending::

      g0 = warp(f1, -t * F)        # where was this pixel in frame1?
      g1 = warp(f2, (1 - t) * F)   # and in frame2?
      out = ((1-t)*m*g0 + t*(1-m)*g1) / ((1-t)*m + t*(1-m))

  (the Super-SloMo-style time-weighted normalized blend: at ``t=0`` it
  reduces to ``f1`` and at ``t=1`` to ``f2`` wherever the mask is
  non-degenerate);
- an optional full-resolution **refinement head** (``cfg.refine_width > 0``,
  same two-conv shape as the U-Net family's) corrects occlusion and
  resampling artifacts.

Everything is trained end-to-end from the reference's triplet loss alone
(combined MSE + SSIM on the midpoint, reference ``model/train.py:75-87``) —
the warp is differentiable in both the flow and the source pixels, so no
flow supervision is needed.

Capability wins over both other families:

- **True arbitrary-time sampling by construction**: motion scales linearly
  with ``t``, so one trained model samples any time — no t-channel
  retraining, no bisection error accumulation.
- **One backbone pass per pair for ANY interpolation factor**: ``motion()``
  runs once, then each extra in-between frame costs only two warps + blend
  (the engine's flow-aware ``_pair_fn``); the bisection path pays
  ``2**depth - 1`` full forwards.

Constraints: ``space_to_depth`` must be 1 (the motion field lives in pixel
space; a warp in block-rearranged space is not a motion). ``base_width``
sizes the backbone as usual — the motion task needs far less capacity than
direct regression (flow + mask are 3 smooth channels), so ``--base-width
32`` is the recommended operating point (~4.3 M params vs 17.3 M).

The family's speed lever is ``cfg.flow_scale`` (the analog of the U-Net
family's ``space_to_depth``): the backbone consumes ``s x s`` average-pooled
frames and predicts the field at 1/s resolution; the field is bilinearly
upsampled (half-pixel grid, the exact inverse of the pooling grid) with
displacements scaled by ``s`` back to pixel units, and the warp + blend (+
refine head) still run at full resolution. Motion is smooth, so the field
survives downsampling far better than pixels do — backbone cost drops
~``s**2`` with sub-pixel output detail intact.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.resize import resize_bilinear
from ..ops.warp import backward_warp
from .unet import UNet

Dtype = Any


class FlowInterpolator(nn.Module):
    """Drop-in third family: same ``(f1, f2, t=None, train=False)`` call
    signature as ``FrameInterpolationUNet``/``TowerInterpolator``, plus
    separable ``motion``/``sample`` methods the engine uses to amortize the
    backbone over many sample times."""

    cfg: ModelConfig = ModelConfig(arch="flow")
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False

    def setup(self):
        if self.cfg.space_to_depth != 1:
            raise ValueError(
                "arch='flow' predicts a pixel-space motion field; "
                "space_to_depth must be 1 (speed comes from the one-pass-"
                "per-pair sampler and the flow_scale lever, not from a "
                "rearranged core)")
        if self.cfg.flow_scale < 1:
            raise ValueError("flow_scale must be >= 1")
        self.backbone = UNet(
            in_channels=self.cfg.in_frames * self.cfg.channels,
            # one (dx, dy) field + mask logit; bidirectional adds a second
            # independent field (frame2 -> frame1)
            out_channels=5 if self.cfg.flow_bidir else 3,
            base_width=self.cfg.base_width,
            depth=self.cfg.depth,
            bilinear=self.cfg.bilinear,
            compute_dtype=self.compute_dtype,
            folded=self.folded,
            upsample=getattr(self.cfg, "upsample", "align_corners"),
            name="motion_unet")
        if self.cfg.refine_width > 0:
            w = self.cfg.refine_width
            cdt = self.compute_dtype
            self.refine1 = nn.Conv(w, (3, 3), padding="SAME", dtype=cdt,
                                   name="refine1")
            self.refine2 = nn.Conv(w, (3, 3), padding="SAME", dtype=cdt,
                                   name="refine2")
            self.refine_out = nn.Conv(self.cfg.channels, (1, 1),
                                      dtype=jnp.float32, name="refine_out")
        if getattr(self.cfg, "flow_cascade", 0) > 0:
            nf = 4 if self.cfg.flow_bidir else 2
            cdt = self.compute_dtype
            stages = []
            for k in range(self.cfg.flow_cascade):
                stages.append((
                    nn.Conv(32, (3, 3), padding="SAME", dtype=cdt,
                            name=f"cascade{k}_1"),
                    nn.Conv(32, (3, 3), padding="SAME", dtype=cdt,
                            name=f"cascade{k}_2"),
                    # zero-init residual head: each stage starts as the
                    # identity on (flow, mask) and only learns corrections
                    nn.Conv(nf + 1, (3, 3), padding="SAME",
                            dtype=jnp.float32,
                            kernel_init=nn.initializers.zeros,
                            name=f"cascade{k}_out")))
            self.cascade_stages = stages

    def motion(self, frame1: jax.Array, frame2: jax.Array,
               train: bool = False) -> Tuple[jax.Array, jax.Array]:
        """One backbone pass -> (flow [B,H,W,2] in pixels, mask [B,H,W,1]).

        ``flow`` is the frame1 -> frame2 motion; ``mask`` is the sigmoid
        blend weight toward the frame1-warped candidate. With
        ``cfg.flow_bidir`` the flow is [B,H,W,4]: channels 0-1 the
        frame1 -> frame2 field, channels 2-3 the independent
        frame2 -> frame1 field.

        With ``cfg.flow_scale = s > 1`` the backbone sees s x s average-
        pooled frames and its field is bilinearly upsampled back (half-pixel
        grid — the exact inverse of the pooling grid) with displacements
        scaled by ``s`` into full-resolution pixel units; outputs are always
        full resolution regardless of ``s``.
        """
        s = self.cfg.flow_scale
        x = jnp.concatenate([frame1, frame2], axis=-1)
        if s > 1:
            b, h, w, c = x.shape
            x = x.reshape(b, h // s, s, w // s, s, c).mean(
                axis=(2, 4), dtype=jnp.float32).astype(x.dtype)
        y = self.backbone(x, train)  # f32 output head
        nf = 4 if self.cfg.flow_bidir else 2
        flow, mask_logit = y[..., :nf], y[..., nf:nf + 1]
        if s > 1:
            full_hw = (frame1.shape[1], frame1.shape[2])
            flow = resize_bilinear(flow * float(s), full_hw,
                                   align_corners=False)
            mask_logit = resize_bilinear(mask_logit, full_hw,
                                         align_corners=False)
        for stage in getattr(self, "cascade_stages", ()):
            flow, mask_logit = self._cascade_step(stage, frame1, frame2,
                                                  flow, mask_logit)
        return flow, nn.sigmoid(mask_logit)

    def _cascade_step(self, stage, frame1, frame2, flow, mask_logit):
        """One residual field-refinement stage (cfg.flow_cascade): warp both
        frames to the midpoint with the CURRENT field, let a thin full-res
        net see where the candidates disagree, and emit residuals for the
        field and the mask logit. Runs at t=0.5 (the training target time);
        the corrected field remains time-independent, so amortized
        arbitrary-time sampling is unaffected."""
        conv1, conv2, conv_out = stage
        cdt = self.compute_dtype
        half = jnp.float32(0.5)
        if self.cfg.flow_bidir:
            f01, f10 = flow[..., :2], flow[..., 2:4]
            ft0, ft1 = -0.25 * f01 + 0.25 * f10, 0.25 * f01 - 0.25 * f10
        else:
            ft0, ft1 = -half * flow, half * flow
        g0 = backward_warp(frame1.astype(cdt), ft0, impl=self.cfg.warp_impl,
                           max_flow=self.cfg.max_flow)
        g1 = backward_warp(frame2.astype(cdt), ft1, impl=self.cfg.warp_impl,
                           max_flow=self.cfg.max_flow)
        z = jnp.concatenate([frame1.astype(cdt), frame2.astype(cdt), g0, g1,
                             flow.astype(cdt), mask_logit.astype(cdt)],
                            axis=-1)
        z = nn.relu(conv1(z))
        z = nn.relu(conv2(z))
        d = conv_out(z.astype(jnp.float32))
        nf = 4 if self.cfg.flow_bidir else 2
        return flow + d[..., :nf], mask_logit + d[..., nf:nf + 1]

    def sample_parts(self, frame1, frame2, flow, mask, t):
        """The warp + blend core of ``sample`` without the refinement head:
        returns ``(out, g0, g1)`` so the engine can pair ANY warp route
        (bidir, pyramid, gather4 — the cases the fused sampler kernel
        doesn't cover) with the fused Pallas refine head
        (``ops/pallas/refine_fused``)."""
        cdt = self.compute_dtype
        tb = t.astype(jnp.float32)[:, None, None, None]
        f1 = frame1.astype(cdt)
        f2 = frame2.astype(cdt)
        if self.cfg.flow_bidir:
            # Super-SloMo linear approximation of the time-t warp fields
            # from two independent endpoint fields (config.py:flow_bidir);
            # reduces to the single-field branch when f10 == -f01.
            f01, f10 = flow[..., :2], flow[..., 2:4]
            ft0 = -(1.0 - tb) * tb * f01 + tb * tb * f10
            ft1 = (1.0 - tb) ** 2 * f01 - tb * (1.0 - tb) * f10
        else:
            ft0 = -tb * flow
            ft1 = (1.0 - tb) * flow
        g0 = backward_warp(f1, ft0, impl=self.cfg.warp_impl,
                           max_flow=self.cfg.max_flow)
        g1 = backward_warp(f2, ft1, impl=self.cfg.warp_impl,
                           max_flow=self.cfg.max_flow)
        w0 = ((1.0 - tb) * mask).astype(jnp.float32)
        w1 = (tb * (1.0 - mask)).astype(jnp.float32)
        out = ((w0 * g0.astype(jnp.float32) + w1 * g1.astype(jnp.float32))
               / (w0 + w1 + 1e-6))
        return out, g0, g1

    def sample(self, frame1: jax.Array, frame2: jax.Array, flow: jax.Array,
               mask: jax.Array, t: jax.Array,
               train: bool = False) -> jax.Array:
        """Synthesize the frame at time ``t`` ([B] in [0, 1]) from a
        precomputed motion field: two warps + blend (+ refinement head)."""
        out, g0, g1 = self.sample_parts(frame1, frame2, flow, mask, t)
        cdt = self.compute_dtype
        return self.refine(out, g0, g1, frame1.astype(cdt),
                           frame2.astype(cdt))

    def refine(self, out: jax.Array, g0: jax.Array, g1: jax.Array,
               frame1: jax.Array, frame2: jax.Array) -> jax.Array:
        """The optional refinement head alone — exposed as a method so the
        engine can pair it with the fused Pallas sampler
        (``ops/pallas/warp_fused.sample_fused`` computes out/g0/g1 in one
        kernel; this applies the same convs the monolithic path uses)."""
        if self.cfg.refine_width <= 0:
            return out
        cdt = self.compute_dtype
        z = jnp.concatenate([out.astype(cdt), g0.astype(cdt),
                             g1.astype(cdt), frame1.astype(cdt),
                             frame2.astype(cdt)], axis=-1)
        z = nn.relu(self.refine1(z))
        z = nn.relu(self.refine2(z))
        return out + self.refine_out(z.astype(jnp.float32))

    def __call__(self, frame1: jax.Array, frame2: jax.Array,
                 t: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        if t is None:
            t = jnp.full((frame1.shape[0],), 0.5, jnp.float32)
        flow, mask = self.motion(frame1, frame2, train)
        # expose the field to the training loss (flow-smoothness
        # regularizer); a no-op unless 'intermediates' is mutable
        self.sow("intermediates", "flow", flow)
        return self.sample(frame1, frame2, flow, mask, t, train)
