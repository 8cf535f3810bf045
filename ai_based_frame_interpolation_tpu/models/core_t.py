"""Transposed-layout inference core for the s2d U-Net (round 4).

The round-3 layout-true HLO attribution (``docs/hlo_attribution.json``)
showed the production dispatch dominated by the U-Net core's conv fusions,
with every <128-channel level paying XLA's NHWC 128-lane channel padding.
The fused double-conv kernel (``ops/pallas/dconv_fused.py``) removes that
tax by computing each ``conv-relu-conv-relu`` block in the row-major
transposed layout ``[B, H, C, W]`` (width on lanes, channels on 8-sublane
padding) with the mid activation VMEM-resident. The TPU probe
(``scripts/dconv_probe.py``, docs/PERF.md round-4 section) measured
2.05x / 1.45x / 1.33x / 0.83x / 1.25x vs XLA at the five outer s2d4 core
blocks (inc, down1, down2, up3, up4).

This module is the *integration*: a pure-function folded-inference forward
(replacing ``FrameInterpolationUNet.__call__`` up to ``skip_refine``) that
keeps the OUTER levels in the transposed layout end-to-end — stem,
double-convs, pools, upsamples and skip concats — so the per-block
boundary relayouts that killed core_pack / polyphase / tower-restructure
(the shuffle-eats-packing failure mode, docs/PERF.md) never materialize:

    stem_t (s2d + concat, transposed)            [B, H0, C0, W0p]
      inc_t    -> pallas double-conv             skips saved transposed
      pool_t -> down1_t -> pool_t -> down2_t     (pallas)
        -> ONE small relayout to NHWC            [B, H2, W2, 4w]
        down3 / down4 / up1 / up2 via XLA NHWC   (256-512 channels: no
                                                  padding tax, tiny dims)
        -> ONE small relayout back               [B, H2, C, W2p]
      up3_t -> up4_t  (upsample_t + concat + pallas double-conv)
      outc: the 1x1 conv contracts C — its output lands NHWC for FREE
    residual add + refine head run NHWC as before.

The deep middle stays NHWC because (a) its W dims fall below the 128-lane
grid (60, 30 at 1080p) and (b) its 256-512 channel operands are exactly
where the probe shows XLA at parity. The two relayouts it costs are at the
smallest tensors in the network.

Weights are the UNCHANGED folded param tree (``fold_batchnorm``) — the
kernel repacks them per-call (fused into the jit graph, amortized by XLA
CSE across steps). Checkpoints, training, and the `.pth` parity path are
untouched; routing is an inference-engine decision
(``infer/engine.py:_forward``), default-gated until TPU-validated.

Reference match: the core math is reference ``model/unet.py:65-95``
(DoubleConv/Down/Up/OutConv); this file is a layout re-plumbing of the
same network, bit-compatible with the NHWC path to bf16 rounding
(pinned by ``tests/test_core_t.py``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.pallas.dconv_fused import double_conv_fused, double_conv_reference
from ..ops.resize import (_lerp_axis, _linear_matrix_np,
                          upsample2x_align_corners, upsample2x_half_pixel)

# Levels routed to the pallas kernel (the others in the transposed segment
# use an XLA conv with transposed dimension_numbers). Module-level so A/B
# scripts can flip routing in-process; "up3" is included despite its 0.83x
# isolated probe because excluding it would re-materialize two boundary
# relayouts at 136x240x256 — the end-to-end A/B decides (docs/PERF.md).
PALLAS_LEVELS = frozenset({"inc", "down1", "down2", "up3", "up4"})

# Max acceptable lane-padding ratio ceil128(w)/w at each transposed level.
_MAX_PAD_RATIO = 1.2


def _ceil128(w: int) -> int:
    return ((w + 127) // 128) * 128


def eligible(cfg: ModelConfig, height: int, width: int) -> bool:
    """Static routing predicate (padded full-res H, W).

    Requires the production core family (unet, bilinear decoder, depth 4,
    s2d>1, no time plane), 8-multiple channel widths, pool-exact heights,
    and lane-pad ratios <= ~1.07 at the three transposed widths — 1080p,
    and 4K s2d4 cores qualify; 720p/1440p (W1 pad ratio 1.6) and small
    inputs fall back to NHWC.
    """
    if getattr(cfg, "arch", "unet") != "unet" or not cfg.bilinear:
        return False
    if cfg.depth != 4 or cfg.space_to_depth < 2 or cfg.time_conditioned:
        return False
    r = cfg.space_to_depth
    if height % (16 * r) or width % (16 * r):
        return False
    h0, w0 = height // r, width // r
    c0 = 2 * cfg.channels * r * r
    if c0 % 8 or cfg.base_width % 8:
        return False
    if h0 % 16 or h0 < 32:
        return False
    for wt in (w0, w0 // 2, w0 // 4):
        if _ceil128(wt) / wt > _MAX_PAD_RATIO:
            return False
    # Decoder lane-width joins: each level's padded width must equal the
    # independently-rounded width of that level, or the up3/up4 skip
    # concats trace-fail on a width mismatch (e.g. w0=1360: input width
    # 5440 at s2d4 passes every pad-ratio check but 2*ceil128(w0/4)=768
    # != ceil128(w0)/2=704).
    if _ceil128(w0) // 2 != _ceil128(w0 // 2):
        return False
    if 2 * _ceil128(w0 // 4) != _ceil128(w0) // 2:
        return False
    return True


def _to_t(x: jax.Array, wp: int) -> jax.Array:
    """NHWC -> [B, H, C, W] with zero lane padding to ``wp``."""
    xt = jnp.transpose(x, (0, 1, 3, 2))
    w = xt.shape[-1]
    if wp != w:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    return xt


def _stem_t(frame: jax.Array, r: int, wp: int, cdt) -> jax.Array:
    """space_to_depth + transpose in one rearrange: [B,H,W,C] ->
    [B, H/r, r*r*C, W/r (zero-padded to wp)], channel order (ry, rx, c)
    matching ``models.unet.space_to_depth``."""
    b, h, w, c = frame.shape
    if c == 1:
        # rank-3 path: the trailing size-1 channel dim costs a pad-3.1
        # layout copy in the rank-6 rearrange (round-4 attribution) —
        # squeezing it first keeps W on lanes with no C padding
        x = frame[..., 0].reshape(b, h // r, r, w // r, r)
        x = x.transpose(0, 1, 2, 4, 3).reshape(b, h // r, r * r, w // r)
    else:
        x = frame.reshape(b, h // r, r, w // r, r, c)
        x = x.transpose(0, 1, 2, 4, 5, 3).reshape(b, h // r, r * r * c,
                                                  w // r)
    x = x.astype(cdt)
    if wp != w // r:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wp - w // r)))
    return x


# Pool lowering on [B,H,C,W]. TPU probe (scripts/pool_t_probe.py, pool1 =
# the 272x64x512 production shape, ms/item marginal): stride-2 lane
# slicing ("slice") 0.352 — it lowers to pad-2 gather fusions, 11.4 GB of
# the b64 core_t dispatch per the round-4 attribution; selection-matmul
# ("matmul") 0.183; XLA's native "reduce_window" **0.030** — within ~2x of
# the read+write floor. Default: reduce_window.
POOL_IMPL = "reduce_window"


def _pool2_t(x: jax.Array) -> jax.Array:
    """2x2 max-pool on [B, H, C, W]. Inputs are post-relu (>= 0), so the
    zero lane padding survives the max unchanged."""
    if POOL_IMPL == "reduce_window":
        return jax.lax.reduce_window(
            x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max,
            (1, 2, 1, 2), (1, 2, 1, 2), "VALID")
    if POOL_IMPL == "matmul":
        wp = x.shape[-1]
        sel = np.zeros((2, wp, wp // 2), np.float32)
        sel[0, np.arange(0, wp, 2), np.arange(wp // 2)] = 1.0
        sel[1, np.arange(1, wp, 2), np.arange(wp // 2)] = 1.0
        a = jnp.maximum(x[:, 0::2], x[:, 1::2])     # H pool: major-dim slices
        e = jnp.einsum("bhcw,wv->bhcv", a, jnp.asarray(sel[0], x.dtype))
        o = jnp.einsum("bhcw,wv->bhcv", a, jnp.asarray(sel[1], x.dtype))
        return jnp.maximum(e, o)
    a = jnp.maximum(x[:, 0::2, :, 0::2], x[:, 0::2, :, 1::2])
    b = jnp.maximum(x[:, 1::2, :, 0::2], x[:, 1::2, :, 1::2])
    return jnp.maximum(a, b)


def _upsample2x_t(x: jax.Array, w_true: int, align_corners: bool) -> jax.Array:
    """x2 bilinear upsample on [B, H, C, W] (true width ``w_true``).

    W axis: constant-matrix MXU contraction on the LANE dim (the matrix is
    zero outside the true-width block, so the lane-pad invariant holds).
    H axis: the shared shift/interleave lerp (``ops/resize._lerp_axis`` is
    axis-generic; H is dim 1 in both layouts).
    """
    b, h, c, wp = x.shape
    m = _linear_matrix_np(w_true, 2 * w_true, align_corners)   # [2w, w]
    mp = np.zeros((2 * wp, wp), np.float32)
    mp[:2 * w_true, :w_true] = m
    mj = jnp.asarray(mp).astype(x.dtype)
    x = jnp.einsum("bhcw,ow->bhco", x, mj,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return _lerp_axis(x, 1, h, 2 * h, align_corners)


def _dconv_t(name: str, p: dict, x: jax.Array, w_true: int, h_true: int,
             cdt, interpret: bool) -> jax.Array:
    """One DoubleConv block on [B, H, C, W]: pallas kernel when routed,
    else an XLA conv pair with transposed dimension_numbers."""
    k1, b1 = p["conv1"]["kernel"], p["conv1"]["bias"]
    k2, b2 = p["conv2"]["kernel"], p["conv2"]["bias"]
    if name in PALLAS_LEVELS:
        return double_conv_fused(x, k1, b1, k2, b2, compute_dtype=cdt,
                                 image_width=w_true, image_height=h_true,
                                 interpret=interpret)
    dn = jax.lax.conv_dimension_numbers(
        x.shape, (3, 3, x.shape[2], int(k1.shape[-1])), ("NHCW", "HWIO", "NHCW"))

    def conv(v, kk, bk):
        y = jax.lax.conv_general_dilated(
            v, jnp.asarray(kk).astype(cdt), (1, 1), "SAME",
            dimension_numbers=dn)
        y = y + jnp.asarray(bk).astype(cdt)[None, None, :, None]
        return jax.nn.relu(y)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, x.shape[-1]), 3)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[1], 1, 1), 1)
    mask = (lane < w_true) & (row < h_true)
    # Mask BETWEEN the convs too: conv1's halo output is nonzero (relu of
    # bias + edge-data taps) and conv2's 3x3 edge taps would read it,
    # diverging from the NHWC reference at the last true column/row —
    # mirroring the Pallas path's in-kernel per-row masking.
    mid = conv(x, k1, b1)
    mid = jnp.where(mask, mid, jnp.zeros_like(mid))
    out = conv(mid, k2, b2)
    return jnp.where(mask, out, jnp.zeros_like(out))


def forward_pre_refine(params: dict, x1: jax.Array, x2: jax.Array,
                       cfg: ModelConfig, compute_dtype=jnp.bfloat16,
                       interpret: bool = False) -> jax.Array:
    """Folded-inference forward up to (and including) the residual add —
    the ``skip_refine=True`` contract of ``FrameInterpolationUNet``:
    normalized NHWC frames in, r-space f32 NHWC prediction out.

    ``params`` is the folded param tree (``variables["params"]``);
    eligibility (:func:`eligible`) must hold for the input shape.
    """
    cdt = compute_dtype
    r = cfg.space_to_depth
    u = params["unet"]
    b, h, w, c = x1.shape
    h0, w0 = h // r, w // r
    wp0 = _ceil128(w0)
    grid_ac = getattr(cfg, "upsample", "align_corners") == "align_corners"
    up_nhwc = (upsample2x_align_corners if grid_ac else upsample2x_half_pixel)

    # stem: s2d + channel concat, directly transposed
    f1t = _stem_t(x1, r, wp0, cdt)
    f2t = _stem_t(x2, r, wp0, cdt)
    xt = jnp.concatenate([f1t, f2t], axis=2)

    # encoder, transposed segment (levels 0-2)
    s0 = _dconv_t("inc", u["inc"], xt, w0, h0, cdt, interpret)
    s1 = _dconv_t("down1", u["down1"]["conv"], _pool2_t(s0),
                  w0 // 2, h0 // 2, cdt, interpret)
    h2, w2 = h0 // 4, w0 // 4
    p2 = _pool2_t(s1)
    hp2 = ((h2 + 7) // 8) * 8
    if hp2 != h2:
        p2 = jnp.pad(p2, ((0, 0), (0, hp2 - h2), (0, 0), (0, 0)))
    s2 = _dconv_t("down2", u["down2"]["conv"], p2, w2, h2, cdt, interpret)

    # relayout to NHWC at the smallest transposed tensor
    s2n = jnp.transpose(s2[:, :h2, :, :w2], (0, 1, 3, 2))

    # deep middle, NHWC (flax max_pool == reduce_window; the conv pair is
    # exactly what nn.Conv emits — double_conv_reference)
    import flax.linen as fnn

    def dc_nhwc(p, v):
        return double_conv_reference(v, p["conv1"]["kernel"],
                                     p["conv1"]["bias"], p["conv2"]["kernel"],
                                     p["conv2"]["bias"], compute_dtype=cdt)

    s3 = dc_nhwc(u["down3"]["conv"],
                 fnn.max_pool(s2n, (2, 2), strides=(2, 2)))
    s4 = dc_nhwc(u["down4"]["conv"],
                 fnn.max_pool(s3, (2, 2), strides=(2, 2)))
    y = dc_nhwc(u["up1"]["conv"],
                jnp.concatenate([s3, up_nhwc(s4).astype(s3.dtype)], axis=-1))
    y = dc_nhwc(u["up2"]["conv"],
                jnp.concatenate([s2n, up_nhwc(y).astype(s2n.dtype)], axis=-1))

    # relayout back; decoder transposed segment (levels 1-0). The fused
    # up-block kernel (upsample + concat + conv pair in one program) is
    # half-pixel only — its in-kernel H taps are parity-static; the
    # align_corners grid keeps the composed path.
    from ..ops.pallas.dconv_fused import up_double_conv_fused

    def up_level(name, skip, low, w_true, h_true):
        p = u[name]["conv"]
        if not grid_ac and name in PALLAS_LEVELS:
            return up_double_conv_fused(
                skip, low, p["conv1"]["kernel"], p["conv1"]["bias"],
                p["conv2"]["kernel"], p["conv2"]["bias"],
                image_width=w_true, compute_dtype=cdt, interpret=interpret)
        yu = _upsample2x_t(low, w_true // 2, grid_ac)
        return _dconv_t(name, p,
                        jnp.concatenate([skip, yu.astype(skip.dtype)],
                                        axis=2),
                        w_true, h_true, cdt, interpret)

    yt = _to_t(y, _ceil128(w2))
    y = up_level("up3", s1, yt, w0 // 2, h0 // 2)
    y = up_level("up4", s0, y, w0, h0)

    # outc: contracting C lands the result NHWC for free (lhs free dims
    # (h, w) + rhs free dim (cout) = [B, H0, W0p, cout])
    ko = jnp.asarray(u["outc"]["kernel"]).reshape(
        y.shape[2], -1).astype(jnp.float32)
    yn = jnp.einsum("bhcw,co->bhwo", y.astype(jnp.float32), ko)
    yn = yn[:, :, :w0, :] + jnp.asarray(u["outc"]["bias"]).astype(jnp.float32)

    if cfg.residual:
        from .unet import space_to_depth

        if c == 1:
            # rank-3 s2d (same trailing-C=1 layout-copy avoidance as the
            # stem); identical (ry, rx) channel order
            def s2d3(f):
                v = f[..., 0].reshape(b, h0, r, w0, r)
                return v.transpose(0, 1, 3, 2, 4).reshape(b, h0, w0, r * r)

            mid = 0.5 * (s2d3(x1) + s2d3(x2))
        else:
            mid = 0.5 * (space_to_depth(x1, r) + space_to_depth(x2, r))
        yn = yn + mid.astype(yn.dtype)
    # the skip_refine=True contract returns the FULL-RES prediction
    # (models/unet.py:408) — the refine head / caller consumes NHWC f32
    from .unet import depth_to_space

    return depth_to_space(yn, r)
