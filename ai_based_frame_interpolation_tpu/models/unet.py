"""TPU-native Flax U-Net for frame interpolation.

Re-implements the capability of the reference architecture (reference
``model/unet.py:5-112``: DoubleConv/Down/Up/OutConv blocks, 4-level
encoder-decoder, widths 64..1024 with a factor-2 decoder when bilinear,
pad-and-concat skips, 1x1 output conv) as an idiomatic JAX/Flax module:

- **NHWC** activations (TPU conv layout) instead of NCHW.
- **bf16 compute / f32 params** mixed precision: convolutions run in
  ``compute_dtype``; BatchNorm statistics and the loss accumulate in f32.
- Bilinear ``align_corners=True`` decoder upsampling as constant-matrix
  contractions on the MXU (``ops/resize.py``) — exact PyTorch parity.
- Under ``jit`` over a sharded batch, BatchNorm's batch-mean/var reductions
  are global automatically (XLA inserts the cross-device collectives), which
  is the TPU-native equivalent of SyncBatchNorm.

Parity facts (asserted in ``tests/test_model.py``): default config
(2 gray frames in, 1 out, ``bilinear=True``) has exactly **17,262,401**
trainable parameters, matching the reference's deployed model; the
``bilinear=False`` variant has 31,037,057.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.polyphase import up2_conv_half_pixel
from ..ops.resize import upsample2x_align_corners, upsample2x_half_pixel

Dtype = Any

# Fuse the half-pixel decoder upsample into the Up block's first conv as a
# low-resolution 4-phase conv (ops/polyphase.py): exact same math, no
# full-res upsampled intermediate, 4x the conv's MXU N width. Module-level
# so A/B scripts can flip it in-process (scripts/resize_ab.py pattern).
# DEFAULT OFF by measurement (scripts/polyphase_ab.py, production 1080p
# b64): 167.4 vs 269.7 mid/s for the lerp chain (-38%) — the full-res
# depth-to-space shuffle + split skip/phase convs + border corrections eat
# the traffic savings, the same failure mode as core_pack and the tower
# conv-then-slice restructure (docs/PERF.md). Output parity: max 1 uint8
# LSB vs the lerp path.
UP_POLYPHASE = False


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """[B,H,W,C] -> [B,H/r,W/r,C*r*r] lossless block rearrange."""
    if r == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // r, w // r, r * r * c)


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of :func:`space_to_depth`."""
    if r == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, r, r, c // (r * r))
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * r, w * r, c // (r * r))


def pack_batch(x: jax.Array, g: int) -> jax.Array:
    """[B,H,W,C] -> [B/g,H,W,g*C]: fold g batch items into the channel axis.

    The inference-only "core pack" layout: XLA stores NHWC activations
    lane-padded to 128 channels in HBM, so a thin-channel U-Net reads/writes
    up to 8x the useful bytes (CLAUDE.md finding 11 — the measured HBM floor
    of the s2d core). Packing g items into channels fills the lane dimension
    exactly; every conv then runs with ``feature_group_count=g`` and the SAME
    per-item weights tiled per group (:func:`tile_params_packed`) — identical
    math, measured 3.1x marginal speedup on the U-Net-shaped probe
    (scripts/grouped_core_probe.py).
    """
    if g == 1:
        return x
    b, h, w, c = x.shape
    x = x.reshape(b // g, g, h, w, c)
    return x.transpose(0, 2, 3, 1, 4).reshape(b // g, h, w, g * c)


def unpack_batch(x: jax.Array, g: int) -> jax.Array:
    """Inverse of :func:`pack_batch`."""
    if g == 1:
        return x
    b, h, w, gc = x.shape
    x = x.reshape(b, h, w, g, gc // g)
    return x.transpose(0, 3, 1, 2, 4).reshape(b * g, h, w, gc // g)


def grouped_concat(parts, g: int) -> jax.Array:
    """Channel-concat per pack group: each part is [B,H,W,g*c_i]; the result
    interleaves the groups' blocks so group i holds [p0_i, p1_i, ...] — what
    a ``feature_group_count=g`` conv expects. With g=1 this is a plain
    concat."""
    if g == 1:
        return jnp.concatenate(parts, axis=-1)
    b, h, w, _ = parts[0].shape
    split = [p.reshape(b, h, w, g, p.shape[-1] // g) for p in parts]
    return jnp.concatenate(split, axis=-1).reshape(b, h, w, -1)


class _ConvParams(nn.Module):
    """Declare a 3x3 conv's params without applying it — same names,
    shapes, dtypes and initializers as ``nn.Conv`` (kernel lecun_normal,
    bias zeros), so a module path holding one is checkpoint-identical to
    the nn.Conv it replaces. Used by the polyphase fused up+conv path,
    which applies the kernel in transformed (phase-composed) form."""

    cin: int
    cout: int
    use_bias: bool

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.cin, self.cout))
        b = (self.param("bias", nn.initializers.zeros, (self.cout,))
             if self.use_bias else None)
        return k, b


class DoubleConv(nn.Module):
    """(3x3 conv, no bias -> BatchNorm -> ReLU) x 2.

    Capability of reference ``model/unet.py:5-21``. With ``folded=True`` the
    BatchNorm affine (inference running stats) is pre-multiplied into the
    conv kernel/bias (see :func:`fold_batchnorm`): identical math, but the
    16 full-resolution normalize passes disappear — at 1080p those are pure
    HBM traffic and dominate the inference profile.
    """

    out_ch: int
    mid_ch: Optional[int] = None
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False
    pack: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 poly_low: Optional[jax.Array] = None) -> jax.Array:
        if self.pack > 1 and not self.folded:
            raise ValueError("pack > 1 requires folded BatchNorm "
                             "(inference-only layout)")
        if poly_low is not None and self.pack > 1:
            # the fused up2+conv path builds its conv params directly and
            # has no grouped-conv support; fail clearly instead of building
            # wrong-channel weights (ADVICE round 3)
            raise ValueError("poly_low (fused up2+conv) is incompatible "
                             "with pack > 1")
        mid = self.mid_ch if self.mid_ch is not None else self.out_ch
        for i, ch in enumerate((mid, self.out_ch)):
            if i == 0 and poly_low is not None:
                # Fused up2+conv1 (ops/polyphase.py): ``x`` is the skip,
                # ``poly_low`` the pre-upsample activation. The param tree
                # is identical to the nn.Conv path (same name/shapes/init),
                # so checkpoints are interchangeable between impls.
                cin = x.shape[-1] + poly_low.shape[-1]
                k, bias = _ConvParams(cin, ch, self.folded, name="conv1")()
                x = up2_conv_half_pixel(
                    poly_low, x, k, bias,
                    compute_dtype=self.compute_dtype).astype(
                        self.compute_dtype)
            else:
                x = nn.Conv(ch * self.pack, (3, 3), padding="SAME",
                            use_bias=self.folded, dtype=self.compute_dtype,
                            feature_group_count=self.pack,
                            name=f"conv{i + 1}")(x)
            if not self.folded:
                # BN statistics in f32 for stability; torch defaults eps=1e-5,
                # momentum 0.1 (flax: momentum = 1 - torch_momentum).
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=f"bn{i + 1}")(x)
            x = nn.relu(x).astype(self.compute_dtype)
        return x


class Down(nn.Module):
    """2x2 max-pool then DoubleConv (reference ``model/unet.py:23-33``)."""

    out_ch: int
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False
    pack: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return DoubleConv(self.out_ch, compute_dtype=self.compute_dtype,
                          folded=self.folded, pack=self.pack,
                          name="conv")(x, train)


class Up(nn.Module):
    """Upsample, pad to the skip's spatial dims, concat, DoubleConv.

    Capability of reference ``model/unet.py:35-55``: bilinear
    ``align_corners=True`` x2 (or 2x2 stride-2 transposed conv), symmetric
    pad of the upsampled map to match the skip, channel concat, then
    DoubleConv with ``mid = in_ch // 2`` in the bilinear variant.
    """

    out_ch: int
    bilinear: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False
    upsample: str = "align_corners"
    pack: int = 1

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        # per-item channels after concat (pack-invariant: packed tensors
        # carry pack * per-item channels)
        in_ch = (x1.shape[-1] + x2.shape[-1]) // self.pack
        if self.bilinear:
            mid = in_ch // 2
            if (UP_POLYPHASE and self.upsample == "half_pixel"
                    and self.pack == 1
                    and x2.shape[-3] == 2 * x1.shape[-3]
                    and x2.shape[-2] == 2 * x1.shape[-2]):
                # fused up2+conv1 (exact; ops/polyphase.py) — no full-res
                # upsampled intermediate, 4x conv1 MXU N width
                return DoubleConv(self.out_ch, mid_ch=mid,
                                  folded=self.folded,
                                  compute_dtype=self.compute_dtype,
                                  name="conv")(x2, train, poly_low=x1)
            if self.upsample == "half_pixel":
                x1 = upsample2x_half_pixel(x1)
            else:
                x1 = upsample2x_align_corners(x1)
        else:
            if self.pack > 1:
                raise ValueError("pack > 1 supports the bilinear decoder only")
            x1 = nn.ConvTranspose(x1.shape[-1] // 2, (2, 2), strides=(2, 2),
                                  dtype=self.compute_dtype, name="up")(x1)
            in_ch = x1.shape[-1] + x2.shape[-1]
            mid = None
        # Pad the upsampled map to the skip's H/W (NHWC): floor on the
        # leading side, remainder trailing — same split as the reference.
        dh = x2.shape[-3] - x1.shape[-3]
        dw = x2.shape[-2] - x1.shape[-2]
        if dh or dw:
            pad = [(0, 0)] * (x1.ndim - 3) + [
                (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2), (0, 0)]
            x1 = jnp.pad(x1, pad)
        x = grouped_concat([x2, x1.astype(x2.dtype)], self.pack)
        return DoubleConv(self.out_ch, mid_ch=mid, folded=self.folded,
                          compute_dtype=self.compute_dtype, pack=self.pack,
                          name="conv")(x, train)


class UNet(nn.Module):
    """Encoder-decoder U-Net (reference ``model/unet.py:65-95``).

    ``widths[i] = base_width * 2**i``; the bottleneck and decoder widths are
    halved when ``bilinear`` (the reference's ``factor = 2``).
    """

    in_channels: int = 2
    out_channels: int = 1
    base_width: int = 64
    depth: int = 4
    bilinear: bool = True
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False
    upsample: str = "align_corners"
    pack: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        w = self.base_width
        factor = 2 if self.bilinear else 1
        cdt = self.compute_dtype
        g = self.pack
        x = x.astype(cdt)

        skips = [DoubleConv(w, compute_dtype=cdt, folded=self.folded,
                            pack=g, name="inc")(x, train)]
        for i in range(1, self.depth + 1):
            ch = w * (2 ** i)
            if i == self.depth:
                ch //= factor
            skips.append(Down(ch, compute_dtype=cdt, folded=self.folded,
                              pack=g, name=f"down{i}")(skips[-1], train))

        y = skips[-1]
        for i in range(1, self.depth + 1):
            ch = w * (2 ** (self.depth - i))
            if i < self.depth:
                ch //= factor
            # up1 pairs the bottleneck with skip[depth-1], etc.
            y = Up(ch, bilinear=self.bilinear, compute_dtype=cdt,
                   folded=self.folded, upsample=self.upsample, pack=g,
                   name=f"up{i}")(y, skips[self.depth - i], train)

        y = nn.Conv(self.out_channels * g, (1, 1), use_bias=True,
                    dtype=jnp.float32, feature_group_count=g,
                    name="outc")(y.astype(jnp.float32))
        return y


class FrameInterpolationUNet(nn.Module):
    """Frames-in, midpoint-frame-out wrapper (reference ``model/unet.py:97-112``).

    Consumes ``cfg.in_frames`` frames concatenated on the channel axis
    (NHWC). With ``cfg.time_conditioned`` a constant-``t`` plane is appended,
    enabling arbitrary-time interpolation — a capability superset over the
    reference, whose multi-frame mode degenerately repeats the midpoint
    (reference ``model/inference.py:124-149``).
    """

    cfg: ModelConfig = ModelConfig()
    compute_dtype: Dtype = jnp.bfloat16
    folded: bool = False
    pack: int = 1

    @nn.compact
    def __call__(self, frame1: jax.Array, frame2: jax.Array,
                 t: Optional[jax.Array] = None, train: bool = False,
                 skip_refine: bool = False) -> jax.Array:
        # skip_refine=True returns the pre-refine full-resolution prediction
        # (incl. the residual), so a caller can apply the refinement head
        # itself — the fused Pallas path (ops/pallas/refine_fused.py) does.
        r = self.cfg.space_to_depth
        P = self.pack
        if r > 1:
            frame1 = space_to_depth(frame1, r)
            frame2 = space_to_depth(frame2, r)
        if P > 1:
            # batch-to-channel packed core (inference only, folded weights):
            # same math via grouped convs, lane-padding-free HBM layout.
            # The refinement head below runs unpacked (it has its own fused
            # kernel and per-item channel structure).
            frame1_u, frame2_u = frame1, frame2
            frame1 = pack_batch(frame1, P)
            frame2 = pack_batch(frame2, P)
        x = grouped_concat([frame1, frame2], P)
        if self.cfg.time_conditioned:
            if t is None:
                t = jnp.full((x.shape[0] * P,), 0.5, x.dtype)
            tmap = t.reshape(x.shape[0], P).astype(x.dtype)
            tmap = jnp.broadcast_to(tmap[:, None, None, :],
                                    (*x.shape[:-1], P))
            x = grouped_concat([x, tmap], P)
        y = UNet(in_channels=self.cfg.in_channels,
                 out_channels=self.cfg.out_channels,
                 base_width=self.cfg.base_width,
                 depth=self.cfg.depth,
                 bilinear=self.cfg.bilinear,
                 compute_dtype=self.compute_dtype,
                 folded=self.folded,
                 upsample=getattr(self.cfg, "upsample", "align_corners"),
                 pack=P,
                 name="unet")(x, train)
        if self.cfg.residual:
            # frame1/frame2 are already space-to-depth'd here; the linear
            # midpoint commutes with the block rearrange
            y = y + 0.5 * (frame1 + frame2).astype(y.dtype)
        if P > 1:
            y = unpack_batch(y, P)
            frame1, frame2 = frame1_u, frame2_u
        if self.cfg.refine_width > 0 and r > 1 and not skip_refine:
            # refinement head: the s2d U-Net's output head emits r*r
            # sub-pixels from one coarse feature vector, which blurs fine
            # detail; two thin convs over (prediction + both source frames)
            # add it back. The head runs at rearrange factor g
            # (cfg.refine_factor): g=1 = full resolution (max detail),
            # g=r = fully s2d (fewest lane-padded bytes — XLA pads thin
            # channels to 128 lanes), intermediate g trades between them.
            g = self.cfg.refine_factor
            if r % g:
                raise ValueError(
                    f"refine_factor {g} must divide space_to_depth {r}")
            w = self.cfg.refine_width
            cdt = self.compute_dtype
            # y / frame1 / frame2 are in r-space here; move them to g-space
            yg = depth_to_space(y, r // g)
            z = jnp.concatenate(
                [yg.astype(cdt), depth_to_space(frame1, r // g).astype(cdt),
                 depth_to_space(frame2, r // g).astype(cdt)], axis=-1)
            z = nn.relu(nn.Conv(w, (3, 3), padding="SAME", dtype=cdt,
                                name="refine1")(z))
            if getattr(self.cfg, "refine_depthwise", False):
                # separable second conv: depthwise 3x3 + pointwise 1x1.
                # ~w/9x fewer FLOPs than the dense 3x3 — the dense conv2 is
                # the dominant MXU cost of the fused head at 1080p.
                z = nn.Conv(w, (3, 3), padding="SAME", dtype=cdt,
                            feature_group_count=w, name="refine2_dw")(z)
                z = nn.relu(nn.Conv(w, (1, 1), dtype=cdt,
                                    name="refine2_pw")(z))
            else:
                z = nn.relu(nn.Conv(w, (3, 3), padding="SAME", dtype=cdt,
                                    name="refine2")(z))
            delta = nn.Conv(self.cfg.channels * g * g, (1, 1),
                            dtype=jnp.float32,
                            name="refine_out")(z.astype(jnp.float32))
            # materialize the refined frame in compute dtype: full-res
            # C=1 f32 tensors at the recursive-bisection boundary can get a
            # lane-minor layout from XLA (128x padding -> OOM at 4x); the
            # add still accumulates in f32
            return depth_to_space((yg + delta).astype(self.compute_dtype), g)
        return depth_to_space(y, r)


def init_variables(model: FrameInterpolationUNet, rng: jax.Array,
                   height: int = 256, width: int = 256, batch: int = 1):
    """Initialize {params, batch_stats} for the model.

    The init is jitted: eager (op-by-op) initialization triggers one XLA
    compile per primitive (~40 convs) which is pathologically slow on CPU
    hosts; a single fused compile is seconds instead of minutes.
    """
    c = model.cfg.channels
    f1 = jnp.zeros((batch, height, width, c), jnp.float32)
    return jax.jit(lambda a, b: model.init(rng, a, b, train=False))(f1, f1)


def count_parameters(variables) -> int:
    """Trainable parameter count (reference ``model/unet.py:114-116``)."""
    params = variables["params"] if "params" in variables else variables
    return sum(int(x.size) for x in jax.tree.leaves(params))


def tile_params_packed(variables, g: int) -> dict:
    """Tile folded U-Net conv weights for the batch-packed core (``pack=g``).

    A ``feature_group_count=g`` conv whose every group should apply the SAME
    per-item weights takes the unpacked kernel tiled g times along the
    output-channel axis (group i reads kernel block i), and the bias tiled g
    times. Only the ``unet`` subtree is tiled — the refinement head runs
    unpacked (see :class:`FrameInterpolationUNet`). Tiling runs on device
    once at engine setup; the tiled weights are ~g x the HBM footprint of
    the originals (69 MB -> ~0.5 GB at g=8 for the default width), which the
    activation-byte savings repay within a batch at production resolutions.
    """

    def tile_tree(node):
        out = {}
        for key, val in node.items():
            if isinstance(val, dict) and "kernel" in val:
                kern = val["kernel"]
                new = {"kernel": jnp.tile(kern,
                                          (1,) * (kern.ndim - 1) + (g,))}
                if "bias" in val:
                    new["bias"] = jnp.tile(val["bias"], g)
                out[key] = new
            elif isinstance(val, dict):
                out[key] = tile_tree(val)
            else:
                out[key] = val
        return out

    if "batch_stats" in variables and variables["batch_stats"]:
        raise ValueError("tile_params_packed expects folded variables "
                         "(run fold_batchnorm first)")
    params = dict(variables["params"])
    params["unet"] = tile_tree(params["unet"])
    return {"params": params}


def fold_batchnorm(variables) -> dict:
    """Pre-multiply inference-mode BatchNorm into the preceding convs.

    For eval-mode BN (running stats): ``bn(conv(x)) = conv(x)*g + b`` with
    ``g = scale/sqrt(var+eps)`` and ``b = bias - mean*g`` per channel, so the
    conv kernel absorbs ``g`` on its output-channel axis and gains bias ``b``.
    Returns ``{"params": ...}`` for the ``folded=True`` model variant —
    mathematically identical (up to float re-association), tested to ~1e-5
    in ``tests/test_folded.py``. BN dominates inference HBM traffic at high
    resolution, which is why the serving engine folds by default.
    """
    import numpy as np

    eps = 1e-5
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])

    def fold_tree(p_node, s_node):
        out = {}
        for key, val in p_node.items():
            if key.startswith("bn"):
                continue  # consumed by the paired conv below
            if key.startswith("conv") and isinstance(val, dict) \
                    and "kernel" in val and f"bn{key[-1]}" in p_node:
                bn_p = p_node[f"bn{key[-1]}"]
                bn_s = s_node[f"bn{key[-1]}"]
                g = bn_p["scale"] / np.sqrt(bn_s["var"] + eps)
                out[key] = {
                    "kernel": (val["kernel"] * g).astype(val["kernel"].dtype),
                    "bias": (bn_p["bias"] - bn_s["mean"] * g
                             ).astype(val["kernel"].dtype)}
            elif isinstance(val, dict) and "kernel" not in val:
                out[key] = fold_tree(val, s_node.get(key, {}))
            else:
                out[key] = val
        return out

    folded = {"params": fold_tree(params, stats)}
    # back onto device once — returning host numpy here would silently
    # re-upload all ~69 MB of weights on every jitted call
    return jax.tree.map(jnp.asarray, folded)
