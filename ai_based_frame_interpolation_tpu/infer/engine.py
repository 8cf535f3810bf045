"""Warm, jitted inference engine with device-resident recursive interpolation.

Replaces the reference's inference stack (``model/inference.py:65-202``) and
*implements* what it only advertises:

- the reference reloads the checkpoint per call / per HTTP request via a
  subprocess (``api/app.py:65-119``) — here the engine loads once and serves
  warm, compiled functions;
- the reference's "multiple intermediate frames" produces N copies of the
  same midpoint (``model/inference.py:124-149``) — here intermediates come
  from true **recursive midpoint bisection** (2x/4x/8x...), all frames
  device-resident between levels;
- the advertised-but-missing video interpolation (``main.py:118-129`` imports
  a nonexistent class) exists for real: streaming decode -> batched pairs ->
  device compute -> streaming encode, with the encode thread overlapped.

TPU-first details: frames cross PCIe as uint8 (4x less traffic), normalize
fuses into the first conv under jit, shapes are static per (batch, H, W)
signature with pad-to-16 once, compute in bf16 on the MXU, output rounds to
uint8 on device.
"""

from __future__ import annotations

import math
import time
from typing import Iterable, Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..models.unet import FrameInterpolationUNet
from ..ops.image import denormalize_to_uint8, normalize_uint8
from ..ops.resize import crop_to, pad_to_multiple


def _bisect(fwd, variables, x1, x2, depth: int) -> List[jax.Array]:
    """All 2**depth - 1 intermediates between x1 and x2, in time order.

    Unrolled at trace time (depth is static and small), so XLA sees one flat
    graph of 2**depth - 1 forward passes and can schedule them freely.
    """
    if depth == 0:
        return []
    mid = fwd(variables, x1, x2)
    return (_bisect(fwd, variables, x1, mid, depth - 1) + [mid] +
            _bisect(fwd, variables, mid, x2, depth - 1))


class InterpolationEngine:
    """Load-once, compile-per-shape, serve-forever interpolation engine.

    ``fold=True`` (default) pre-multiplies inference-mode BatchNorm into the
    conv weights (``models.unet.fold_batchnorm``): same math, far less HBM
    traffic — the difference between ~19 and ~2x that fps at 1080p.
    """

    def __init__(self, model: FrameInterpolationUNet, variables,
                 compute_dtype=jnp.bfloat16, fold: bool = True, mesh=None,
                 refine_impl: str = "auto", core_pack: int = 1,
                 core_impl: str = "xla"):
        # refine_impl: "auto" = fused Pallas refinement head when eligible
        # (TPU, grayscale, refine_factor=1, single device); "xla" = always
        # the Flax/XLA branch. Same math either way (test_refine_fused.py).
        self.refine_impl = refine_impl
        # core_impl: "auto" = transposed-layout Pallas U-Net core when
        # eligible (models/core_t.py: TPU, folded, s2d unet at lane-friendly
        # widths — 1080p/4K); "xla" (DEFAULT) = the Flax NHWC forward;
        # "pallas" forces the transposed core (interpret mode off-TPU, for
        # tests). Same math either way (tests/test_core_t.py, uint8 LSB<=1
        # on TPU). Demoted to option by the round-4 batch sweep: the
        # transposed core wins only at latency batches (+3% b1, +5% b32,
        # within session noise) and LOSES at the throughput batches that
        # define the bench (-2% b64, -12% b128) — XLA's convs put pixels
        # on the MXU M dim and scale with batch; the row-tiled kernels'
        # M is pinned at the channel width (docs/PERF.md round 4).
        self.core_impl = core_impl
        # core_pack g > 1: run the unet-family core with g batch items
        # folded into channels (grouped convs, tiled folded weights — see
        # models.unet.pack_batch). Identical per-item math; removes XLA's
        # 128-lane HBM padding on thin-channel activations, the measured
        # HBM floor of the s2d core. Batches not divisible by g fall back
        # to the unpacked program.
        self.core_pack = core_pack
        # Cap on the batch any ONE compiled dispatch sees. None = off.
        # When set, `_pair_fn` transparently splits larger batches into
        # sequential microbatch dispatches of the SAME compiled program and
        # concatenates on device. This exists for configs whose monolithic
        # graph overruns the remote compile helper above some batch (RGB
        # flow at 1080p fails to compile at batch >= 16, docs/STATUS.md):
        # the caller keeps its production batch; the engine compiles once
        # at the cap and loops. Throughput == the cap's rate (the chunks
        # are the same executable), so pick the largest batch that compiles.
        self.max_dispatch_batch: Optional[int] = None
        # Per-instance compiled-function cache. NOT functools.lru_cache on
        # the methods: that keys on ``self`` in a global cache, so every
        # engine (and its compiled 1080p executables) would live forever —
        # a long-lived server constructing several engines accumulates them
        # all (round-1 VERDICT weak-3). Dropping the engine drops the cache.
        self._fn_cache: dict = {}
        if (fold and isinstance(variables, dict)
                and variables.get("batch_stats")):
            from ..models import build_model
            from ..models.unet import fold_batchnorm

            variables = fold_batchnorm(variables)
            model = build_model(model.cfg, compute_dtype, folded=True)
        self.model = model
        self.cfg: ModelConfig = model.cfg
        self.compute_dtype = compute_dtype
        # SPMD inference: replicate weights across the mesh; inputs are
        # sharded per call (batch axis, or spatial H for batch < devices —
        # parallel/sharding.py). mesh=None => single device, plain arrays.
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import put_replicated

            variables = put_replicated(variables, mesh)
        self.variables = variables

    def _put(self, arr):
        from ..parallel.sharding import put_frames

        return put_frames(arr, self.mesh)

    # -- factory -----------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, path: str, cfg: Optional[ModelConfig] = None,
                        compute_dtype=jnp.bfloat16, fold: bool = True,
                        core_pack: int = 1) -> "InterpolationEngine":
        """Load an Orbax variables dir, a training checkpoint dir, or a
        reference-format ``.pth`` (auto-detected)."""
        import os

        if path.endswith(".pth") or path.endswith(".pt"):
            from ..train.checkpoint import import_pth

            variables = import_pth(path, cfg)
            if cfg is None:
                cfg = ModelConfig()  # .pth implies the reference's config
        else:
            from ..train.checkpoint import load_variables

            if os.path.isdir(os.path.join(path, "variables")) or \
                    os.path.exists(os.path.join(path, "model_config.json")):
                variables, loaded_cfg = load_variables(path)
                cfg = cfg or loaded_cfg or ModelConfig()
            else:
                raise FileNotFoundError(
                    f"no checkpoint at {path} (expected .pth file or an "
                    f"orbax dir with variables/)")
        from ..models import build_model

        model = build_model(cfg or ModelConfig(), compute_dtype)
        return cls(model, variables, compute_dtype, fold=fold,
                   core_pack=core_pack)

    @classmethod
    def random_init(cls, cfg: Optional[ModelConfig] = None, seed: int = 0,
                    compute_dtype=jnp.bfloat16, fold: bool = True,
                    core_pack: int = 1) -> "InterpolationEngine":
        """Engine with random weights (plumbing tests / demos)."""
        from ..models import build_model

        cfg = cfg or ModelConfig()
        model = build_model(cfg, compute_dtype)
        c = cfg.channels
        f = jnp.zeros((1, 64, 64, c), jnp.float32)
        variables = jax.jit(lambda a, b: model.init(
            jax.random.key(seed), a, b, train=False))(f, f)
        return cls(model, variables, compute_dtype, fold=fold,
                   core_pack=core_pack)

    # -- compiled kernels ---------------------------------------------------

    def _fused_refine_ok(self, x) -> bool:
        """Static eligibility for the fused Pallas refinement head: the
        XLA head costs more than the whole s2d=4 core at 1080p (CLAUDE.md
        perf notes), so the engine routes to the kernel whenever it can."""
        if self.refine_impl not in ("auto", "pallas") or self.mesh is not None:
            return False
        if self.refine_impl != "pallas" \
                and jax.devices()[0].platform != "tpu":
            return False          # "pallas" forces (interpret mode off-TPU)
        from ..ops.pallas.refine_fused import eligible

        return eligible(x.shape, self.cfg)

    def _use_pack(self, batch: int) -> bool:
        """Static routing for the batch-packed core: unet family, folded
        weights, bilinear decoder, single device, batch divisible by g."""
        g = int(getattr(self, "core_pack", 1) or 1)
        if g <= 1 or self.mesh is not None:
            return False
        if getattr(self.cfg, "arch", "unet") != "unet" or not self.cfg.bilinear:
            return False
        if isinstance(self.variables, dict) and self.variables.get("batch_stats"):
            return False          # pack requires folded BatchNorm
        limit = self.max_dispatch_batch
        if limit and limit % g:
            return False          # chunk tails must stay divisible
        return batch % g == 0

    def _packed_core(self):
        """Lazy (packed model, tiled variables) for ``core_pack``; the tiled
        weights live on device alongside the originals (g x footprint)."""
        g = int(self.core_pack)
        key = ("packed_core", g)
        if key not in self._fn_cache:
            from ..models import build_model
            from ..models.unet import tile_params_packed

            model = build_model(self.cfg, self.compute_dtype, folded=True,
                                pack=g)
            self._fn_cache[key] = (model,
                                   tile_params_packed(self.variables, g))
        return self._fn_cache[key]

    def _core_t_ok(self, x) -> bool:
        """Static eligibility for the transposed-layout Pallas core
        (models/core_t.py): folded unet-family weights on one TPU at
        lane-friendly geometry. Probe pedigree: docs/PERF.md round 4."""
        impl = getattr(self, "core_impl", "auto")
        if impl not in ("auto", "pallas") or self.mesh is not None:
            return False
        if impl != "pallas" and jax.devices()[0].platform != "tpu":
            return False          # "pallas" forces (interpret mode off-TPU)
        if self._use_pack(int(x.shape[0])):
            return False
        if isinstance(self.variables, dict) and self.variables.get("batch_stats"):
            return False          # requires folded weights
        from ..models import core_t

        return core_t.eligible(self.cfg, int(x.shape[1]), int(x.shape[2]))

    def _forward(self, variables, x1, x2):
        model = self.model
        if self._use_pack(int(x1.shape[0])):
            model = self._packed_core()[0]
        if self._fused_refine_ok(x1):
            from ..ops.pallas.refine_fused import refine_head_fused

            if self._core_t_ok(x1):
                from ..models.core_t import forward_pre_refine

                y = forward_pre_refine(
                    variables["params"], x1, x2, self.cfg,
                    self.compute_dtype,
                    interpret=jax.devices()[0].platform != "tpu")
            else:
                y = model.apply(variables, x1, x2, train=False,
                                skip_refine=True)
            p = variables["params"]
            interp = jax.devices()[0].platform != "tpu"
            if getattr(self.cfg, "refine_depthwise", False):
                out = refine_head_fused(y.astype(jnp.float32), (x1, x2),
                                        p["refine1"], None, p["refine_out"],
                                        refine2_dw=p["refine2_dw"],
                                        refine2_pw=p["refine2_pw"],
                                        compute_dtype=self.compute_dtype,
                                        interpret=interp)
            else:
                out = refine_head_fused(y.astype(jnp.float32), (x1, x2),
                                        p["refine1"], p["refine2"],
                                        p["refine_out"],
                                        compute_dtype=self.compute_dtype,
                                        interpret=interp)
        else:
            out = model.apply(variables, x1, x2, train=False)
        return out.astype(self.compute_dtype)

    def _pair_fn(self, n_out: int, depth: int):
        key = ("pair", n_out, depth)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._chunk_batches(
                self._build_pair_fn(n_out, depth))
        return self._fn_cache[key]

    def _chunk_batches(self, fn):
        """Microbatch wrapper honoring ``max_dispatch_batch`` (see __init__).

        Equal-size chunks reuse one compiled executable; an uneven tail
        chunk costs one extra compile for its shape (callers who care pick
        divisible batches). Under a mesh the inputs are already sharded
        across devices — chunking would just reshard, so it's skipped.
        """

        def wrapper(variables, f1_u8, f2_u8):
            limit = self.max_dispatch_batch
            b = int(f1_u8.shape[0])
            if self._use_pack(b):
                # the packed program takes the TILED weight tree (the inner
                # _forward picks the packed model from the same predicate)
                variables = self._packed_core()[1]
            if not limit or b <= limit or self.mesh is not None:
                return fn(variables, f1_u8, f2_u8)
            outs = [fn(variables, f1_u8[i:i + limit], f2_u8[i:i + limit])
                    for i in range(0, b, limit)]
            return jnp.concatenate(outs, axis=0)

        wrapper._jitted = fn      # cost-analysis probes unwrap this
        return wrapper

    def _flow_sampler_fused_ok(self, x) -> bool:
        """Route the flow sampler to the fused Pallas kernel
        (``ops/pallas/warp_fused``: both shifts-warps + blend in one
        row-tiled program) when eligible. ``sampler_impl`` attribute:
        "auto" (default; kernel on TPU), "xla" (always the Flax path),
        "pallas" (force — interpret mode off-TPU, used by tests)."""
        impl = getattr(self, "sampler_impl", "auto")
        if impl == "xla" or self.mesh is not None:
            return False
        from ..ops.pallas.warp_fused import eligible

        if not eligible(self.cfg, x.shape):
            return False
        if impl == "pallas":
            return True
        if x.shape[-1] == 3 and x.shape[-3] * x.shape[-2] > 1280 * 720:
            # RGB above 720p-many pixels: the fused sampler program
            # deterministically 500s the tunnel compile helper at 1080p (b8
            # AND b16, measured 2026-08-20, scripts/rgb_flow_probe.py) where
            # the split-jit XLA route compiles — keep auto on the working
            # route; "pallas" still forces the kernel for when the helper
            # limit lifts. Gate on pixel count, not width, so portrait
            # (1080x1920) frames don't slip through (ADVICE r2).
            return False
        return jax.devices()[0].platform == "tpu"

    def _flow_refine_fused_ok(self, x) -> bool:
        """Route the flow family's refinement head to the fused Pallas
        kernel (``ops/pallas/refine_fused`` — the flow head is the same
        conv3x3/conv3x3/conv1x1 structure as the unet head, 5 input planes
        instead of 3). Shares the ``refine_impl`` attribute contract:
        "auto" = kernel on TPU, "xla" = Flax path, "pallas" = force
        (interpret mode off-TPU, for tests)."""
        if self.refine_impl == "xla" or self.mesh is not None:
            return False
        if getattr(self.cfg, "refine_depthwise", False):
            return False          # flow head has no depthwise variant
        from ..ops.pallas.refine_fused import eligible

        if not eligible(x.shape, self.cfg):
            return False
        if self.refine_impl == "pallas":
            return True
        return jax.devices()[0].platform == "tpu"

    def _flow_sample(self, variables, x1, x2, flow, mask, t):
        """One time-t sample from a precomputed field — fused kernel
        (warps + blend) + the refine head (fused Pallas when eligible —
        under XLA the lane-padded head convs cost more than the warps), or
        the monolithic Flax ``sample`` method. Same math; the kernel
        interpolates in f32 where the bf16 Flax path interpolates in
        bf16."""
        if self._flow_sampler_fused_ok(x1):
            from ..ops.pallas.warp_fused import sample_fused

            out, g0, g1 = sample_fused(
                x1, x2, flow, mask, t,
                max_flow=self.cfg.max_flow,
                interpret=jax.devices()[0].platform != "tpu")
            if self.cfg.refine_width > 0 and self._flow_refine_fused_ok(x1):
                from ..ops.pallas.refine_fused import refine_head_fused

                p = variables["params"]
                return refine_head_fused(
                    out, (g0, g1, x1, x2), p["refine1"], p["refine2"],
                    p["refine_out"], compute_dtype=self.compute_dtype,
                    interpret=jax.devices()[0].platform != "tpu")
            return self.model.apply(variables, out, g0, g1, x1, x2,
                                    method="refine")
        if self.cfg.refine_width > 0 and self._flow_refine_fused_ok(x1):
            # warp route the sampler kernel doesn't cover (bidir/pyramid/
            # gather4) — still fuse the head, which is the costlier half
            from ..ops.pallas.refine_fused import refine_head_fused

            out, g0, g1 = self.model.apply(variables, x1, x2, flow, mask,
                                           t, method="sample_parts")
            p = variables["params"]
            return refine_head_fused(
                out, (g0, g1, x1, x2), p["refine1"], p["refine2"],
                p["refine_out"], compute_dtype=self.compute_dtype,
                interpret=jax.devices()[0].platform != "tpu")
        return self.model.apply(variables, x1, x2, flow, mask, t,
                                train=False, method="sample")

    def _flow_split_jit(self) -> bool:
        """Split the flow path into two compiled programs (motion backbone;
        full-res warp/blend sampler) instead of one. Device-resident
        handoff — no host round trip — so it's throughput-neutral, but each
        XLA program is roughly half the size. Auto-on for RGB on the TPU
        tunnel: the single-program 3-channel graph deterministically
        overruns the remote compile helper at batch >= 16 (docs/STATUS.md
        round-1 queue); the split compiles. Override via attribute for
        A/Bs."""
        override = getattr(self, "flow_split_override", None)
        if override is not None:
            return bool(override)
        return (self.cfg.channels > 1
                and jax.devices()[0].platform != "cpu")

    def _build_flow_split_fn(self, n_out: int):
        """Two-program flow path: jitted motion pass + per-shape jitted
        sampler, composed by a host-side trampoline (the arrays never leave
        the device between the two dispatches)."""

        def motion_fn(variables, f1_u8, f2_u8):
            x1, _ = pad_to_multiple(
                normalize_uint8(f1_u8, self.compute_dtype),
                self.cfg.pad_multiple)
            x2, _ = pad_to_multiple(
                normalize_uint8(f2_u8, self.compute_dtype),
                self.cfg.pad_multiple)
            flow, mask = self.model.apply(variables, x1, x2, train=False,
                                          method="motion")
            return x1, x2, flow, mask

        jit_motion = jax.jit(motion_fn)

        def sample_fn(hw):
            def f(variables, x1, x2, flow, mask):
                b = x1.shape[0]
                outs = []
                for i in range(n_out):
                    t = jnp.full((b,), (i + 1) / (n_out + 1), jnp.float32)
                    y = self._flow_sample(variables, x1, x2, flow, mask, t)
                    outs.append(crop_to(y.astype(self.compute_dtype), hw))
                return denormalize_to_uint8(jnp.stack(outs, axis=1))

            return jax.jit(f)

        def fn(variables, f1_u8, f2_u8):
            hw = (int(f1_u8.shape[1]), int(f1_u8.shape[2]))
            key = ("flow_sample", n_out, hw)
            if key not in self._fn_cache:
                self._fn_cache[key] = sample_fn(hw)
            x1, x2, flow, mask = jit_motion(variables, f1_u8, f2_u8)
            return self._fn_cache[key](variables, x1, x2, flow, mask)

        return fn

    def _unet_split_jit(self, n_out: int, depth: int) -> bool:
        """Split the unet 2x path into two compiled programs (s2d core up
        to the pre-refine prediction; fused refine head + uint8 out) with
        a device-resident handoff. Same motivation as the flow split: the
        monolithic RGB 1080p graph deterministically overruns the remote
        compile helper at batch >= 32, pinning the RGB flagship at b16
        while gray gains +38%% from b64->b128 batch amortization (round-4
        VERDICT task 5). Auto-on for multi-channel unet on TPU; override
        via the ``unet_split_override`` attribute for A/Bs."""
        if n_out != 1 or depth != 1 or self.mesh is not None:
            return False          # 2x only: bisection needs one program
        if getattr(self.cfg, "arch", "unet") != "unet":
            return False
        if int(getattr(self, "core_pack", 1) or 1) > 1:
            return False
        # the split point IS the fused refine head; every padded engine
        # shape passes its runtime check once these static gates hold
        if not (self.cfg.refine_width > 0 and self.cfg.refine_factor == 1
                and self.cfg.space_to_depth > 1
                and self.refine_impl in ("auto", "pallas")):
            return False
        override = getattr(self, "unet_split_override", None)
        if override is not None:
            return bool(override)
        return (self.cfg.channels > 1
                and jax.devices()[0].platform == "tpu")

    def _build_unet_split_fn(self):
        """Two-program unet 2x: jitted core pass (normalize + pad + s2d
        U-Net to the pre-refine full-res prediction) + per-shape jitted
        refine/output pass. Mirrors ``_build_flow_split_fn``; requires the
        fused refine head (the split point IS the skip_refine contract)."""

        def core_fn(variables, f1_u8, f2_u8):
            x1, _ = pad_to_multiple(
                normalize_uint8(f1_u8, self.compute_dtype),
                self.cfg.pad_multiple)
            x2, _ = pad_to_multiple(
                normalize_uint8(f2_u8, self.compute_dtype),
                self.cfg.pad_multiple)
            if self._core_t_ok(x1):
                from ..models.core_t import forward_pre_refine

                y = forward_pre_refine(
                    variables["params"], x1, x2, self.cfg,
                    self.compute_dtype,
                    interpret=jax.devices()[0].platform != "tpu")
            else:
                y = self.model.apply(variables, x1, x2, train=False,
                                     skip_refine=True)
            return x1, x2, y

        jit_core = jax.jit(core_fn)

        def refine_fn(hw):
            def f(variables, x1, x2, y):
                from ..ops.pallas.refine_fused import refine_head_fused

                p = variables["params"]
                interp = jax.devices()[0].platform != "tpu"
                if getattr(self.cfg, "refine_depthwise", False):
                    out = refine_head_fused(
                        y.astype(jnp.float32), (x1, x2), p["refine1"],
                        None, p["refine_out"],
                        refine2_dw=p["refine2_dw"],
                        refine2_pw=p["refine2_pw"],
                        compute_dtype=self.compute_dtype, interpret=interp)
                else:
                    out = refine_head_fused(
                        y.astype(jnp.float32), (x1, x2), p["refine1"],
                        p["refine2"], p["refine_out"],
                        compute_dtype=self.compute_dtype, interpret=interp)
                out = crop_to(out.astype(self.compute_dtype), hw)
                return denormalize_to_uint8(out[:, None])

            return jax.jit(f)

        def fn(variables, f1_u8, f2_u8):
            hw = (int(f1_u8.shape[1]), int(f1_u8.shape[2]))
            key = ("unet_refine", hw)
            if key not in self._fn_cache:
                self._fn_cache[key] = refine_fn(hw)
            x1, x2, y = jit_core(variables, f1_u8, f2_u8)
            return self._fn_cache[key](variables, x1, x2, y)

        return fn

    def _build_pair_fn(self, n_out: int, depth: int):
        """Jitted: uint8 pair batch -> uint8 [B, n_out, H, W, C] intermediates.

        ``n_out`` of the 2**depth - 1 dyadic intermediates are selected at
        evenly-spaced target times i/(n_out+1) — exact when n_out+1 is a
        power of two (the 2x/4x/8x video paths), nearest-dyadic otherwise.

        The flow family overrides this entirely: ONE motion-backbone pass,
        then each of the n_out frames is two warps + a blend at its EXACT
        target time (no dyadic approximation, no bisection error
        accumulation, no repeated forwards — see models/flow.py).
        """
        if getattr(self.cfg, "arch", "unet") == "flow":
            if self._flow_split_jit():
                return self._build_flow_split_fn(n_out)

            def flow_fn(variables, f1_u8, f2_u8):
                x1, hw = pad_to_multiple(
                    normalize_uint8(f1_u8, self.compute_dtype),
                    self.cfg.pad_multiple)
                x2, _ = pad_to_multiple(
                    normalize_uint8(f2_u8, self.compute_dtype),
                    self.cfg.pad_multiple)
                flow, mask = self.model.apply(variables, x1, x2, train=False,
                                              method="motion")
                b = x1.shape[0]
                outs = []
                for i in range(n_out):
                    t = jnp.full((b,), (i + 1) / (n_out + 1), jnp.float32)
                    y = self._flow_sample(variables, x1, x2, flow, mask, t)
                    outs.append(crop_to(y.astype(self.compute_dtype), hw))
                return denormalize_to_uint8(jnp.stack(outs, axis=1))

            return jax.jit(flow_fn)
        if self._unet_split_jit(n_out, depth):
            return self._build_unet_split_fn()
        total = 2 ** depth - 1

        def fn(variables, f1_u8, f2_u8):
            x1, hw = pad_to_multiple(normalize_uint8(f1_u8, self.compute_dtype),
                                     self.cfg.pad_multiple)
            x2, _ = pad_to_multiple(normalize_uint8(f2_u8, self.compute_dtype),
                                    self.cfg.pad_multiple)
            mids = _bisect(self._forward, variables, x1, x2, depth)
            if n_out == total:
                picked = mids
            else:
                idx = [min(total - 1, round((i + 1) * (total + 1) /
                                            (n_out + 1)) - 1)
                       for i in range(n_out)]
                picked = [mids[i] for i in idx]
            out = jnp.stack([crop_to(m, hw) for m in picked], axis=1)
            return denormalize_to_uint8(out)

        return jax.jit(fn)

    def _tower_stream_fn(self):
        key = ("tower_stream",)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build_tower_stream_fn()
        return self._fn_cache[key]

    def _build_tower_stream_fn(self):
        """Jitted tower-stream step: [K,H,W,C] u8 frames -> [K-1,H,W,C] u8
        midpoints with each frame encoded exactly ONCE (the pyramids for
        pairs (i,i+1) are slices of one batched encode). Only possible with
        the tower family — the concat-input U-Net can't separate per-frame
        work (models/tower.py)."""

        def fn(variables, frames_u8):
            x, hw = pad_to_multiple(
                normalize_uint8(frames_u8, self.compute_dtype),
                self.cfg.pad_multiple)
            feats = self.model.apply(variables, x, train=False,
                                     method="encode")
            f1s = [f[:-1] for f in feats]
            f2s = [f[1:] for f in feats]
            y = self.model.apply(variables, f1s, f2s, x[:-1], x[1:],
                                 train=False, method="decode")
            return denormalize_to_uint8(crop_to(y.astype(self.compute_dtype),
                                                hw))

        return jax.jit(fn)

    def _tower_video_frames(self, frames, batch_pairs: int):
        """2x stream for tower models: chunked batched encode, shared-frame
        feature reuse, double-buffered like the generic path."""
        from ..ops import native

        fn = self._tower_stream_fn()
        chunk_size = batch_pairs + 1

        def dispatch(chunk: List[np.ndarray]):
            stacked = np.stack(chunk)
            return stacked, fn(self.variables, self._put(stacked))

        def emit(batch, final: bool):
            originals, device_out = batch
            mids = np.asarray(device_out)[:, None]     # [P, 1, H, W, C]
            stream = native.interleave(originals, mids)
            end = len(stream) if final else len(stream) - 1
            for i in range(end):
                yield stream[i]

        chunk: List[np.ndarray] = []
        in_flight = None
        for frame in frames:
            chunk.append(np.asarray(frame))
            if len(chunk) == chunk_size:
                batch = dispatch(chunk)
                chunk = [chunk[-1]]        # boundary frame opens next chunk
                if in_flight is not None:
                    yield from emit(in_flight, final=False)
                in_flight = batch
        if len(chunk) >= 2:
            batch = dispatch(chunk)
            if in_flight is not None:
                yield from emit(in_flight, final=False)
            in_flight = batch
        if in_flight is not None:
            yield from emit(in_flight, final=True)
        elif chunk:
            yield chunk[0]                 # single-frame input passthrough

    def _time_fn(self, n_t: int):
        key = ("time", n_t)
        if key not in self._fn_cache:
            self._fn_cache[key] = self._build_time_fn(n_t)
        return self._fn_cache[key]

    def _build_time_fn(self, n_t: int):
        """Jitted arbitrary-time sampler: n_t frames at caller-chosen times.

        Requires a ``time_conditioned`` model (capability superset: the
        reference has no time conditioning at all — its 'multi frame' mode
        repeats the midpoint, ``model/inference.py:124-149``)."""

        def fn(variables, f1_u8, f2_u8, ts):
            # ts: [n_t] (one time per output, broadcast over the batch) or
            # [n_t, B] (per-pair times — the batched retiming path)
            x1, hw = pad_to_multiple(normalize_uint8(f1_u8, self.compute_dtype),
                                     self.cfg.pad_multiple)
            x2, _ = pad_to_multiple(normalize_uint8(f2_u8, self.compute_dtype),
                                    self.cfg.pad_multiple)
            b = x1.shape[0]
            is_flow = getattr(self.cfg, "arch", "unet") == "flow"
            if is_flow:  # one backbone pass amortized over all sample times
                flow, mask = self.model.apply(variables, x1, x2, train=False,
                                              method="motion")
            outs = []
            for i in range(n_t):
                t = jnp.broadcast_to(ts[i], (b,)).astype(jnp.float32)
                if is_flow:
                    y = self._flow_sample(variables, x1, x2, flow, mask, t)
                else:
                    y = self.model.apply(variables, x1, x2, t=t, train=False)
                outs.append(crop_to(y.astype(self.compute_dtype), hw))
            return denormalize_to_uint8(jnp.stack(outs, axis=1))

        return jax.jit(fn)

    # -- public API ---------------------------------------------------------

    def interpolate_at(self, f1: np.ndarray, f2: np.ndarray,
                       times: Sequence[float]) -> List[np.ndarray]:
        """Frames at arbitrary times in (0, 1) — time-conditioned models
        (t-channel U-Net/tower, or the flow family, which is
        time-conditioned by construction)."""
        if not self.supports_exact_time:
            raise ValueError(
                "interpolate_at requires a time_conditioned model; "
                "use generate_intermediate_frames (bisection) instead")
        ts = jnp.asarray(list(times), jnp.float32)
        out = self._time_fn(len(times))(self.variables, self._put(f1[None]),
                                        self._put(f2[None]), ts)
        return [np.asarray(out[0, i]) for i in range(len(times))]

    def interpolate_pair(self, f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
        """Single midpoint between two HWC uint8 frames -> HWC uint8.

        The warm replacement for reference ``interpolate_frames``
        (``model/inference.py:101-122``)."""
        return self.interpolate_batch(f1[None], f2[None])[0]

    def interpolate_batch(self, f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
        """Batched midpoints: [B,H,W,C] u8 x2 -> [B,H,W,C] u8."""
        out = self._pair_fn(1, 1)(self.variables, self._put(f1),
                                  self._put(f2))
        return np.asarray(out[:, 0])

    def generate_intermediate_frames(self, f1: np.ndarray, f2: np.ndarray,
                                     num: int) -> List[np.ndarray]:
        """N in-between frames in time order (contract of reference
        ``generate_multiple_intermediate_frames``, ``model/inference.py:124-149``
        — but actually distinct frames via bisection)."""
        if num < 1:
            raise ValueError("num must be >= 1")
        depth = max(1, math.ceil(math.log2(num + 1)))
        out = self._pair_fn(num, depth)(self.variables, self._put(f1[None]),
                                        self._put(f2[None]))
        return [np.asarray(out[0, i]) for i in range(num)]

    def interpolate_video_frames(
            self, frames: Iterable[np.ndarray], factor: int = 2,
            batch_pairs: int = 8) -> Iterator[np.ndarray]:
        """Stream-interpolate a frame iterable to ``factor``x frame rate.

        Yields output frames in order: f0, m0_1.., f1, m1_1.., ..., fN.
        Each consecutive pair contributes ``factor - 1`` intermediates.
        Any integer ``factor >= 2`` is accepted: exact-time models (the
        flow family, or ``time_conditioned``) sample the exact i/factor
        times; bisection models are exact for power-of-two factors and use
        the nearest dyadic times otherwise (see ``_pair_fn``). Frame pairs
        are batched ``batch_pairs`` at a time; the two jitted shapes
        ([batch_pairs] and the remainder) are compiled once and reused for
        the whole stream.
        """
        if factor < 2:
            raise ValueError("factor must be an integer >= 2")
        if getattr(self.cfg, "arch", "unet") == "tower" and factor == 2:
            # tower family: per-frame feature reuse across adjacent pairs
            yield from self._tower_video_frames(frames, batch_pairs)
            return
        depth = max(1, math.ceil(math.log2(factor)))
        fn = self._pair_fn(factor - 1, depth)

        from ..ops import native

        def dispatch(pairs: List[Tuple[np.ndarray, np.ndarray]]):
            """Start the device computation for a batch (async) and keep the
            host-side originals for assembly."""
            if len(pairs) > 1:
                f0 = np.stack([p[0] for p in pairs])
            else:
                f0 = pairs[0][0][None]
            f1 = np.stack([p[1] for p in pairs]) if len(pairs) > 1 \
                else pairs[0][1][None]
            out = fn(self.variables, self._put(f0), self._put(f1))
            return f0, pairs[-1][1], out

        def emit(batch, final: bool):
            """Materialize a dispatched batch and yield playback-order frames
            (native single-pass interleave); the trailing original is held
            back unless this is the final batch — it opens the next one."""
            f0b, f1_last, device_out = batch
            mids = np.asarray(device_out)          # blocks; next batch is
            originals = np.concatenate([f0b, f1_last[None]], axis=0)
            stream = native.interleave(originals, mids)  # already in flight
            end = len(stream) if final else len(stream) - 1
            for i in range(end):
                yield stream[i]

        prev_frame: Optional[np.ndarray] = None
        pending: List[Tuple[np.ndarray, np.ndarray]] = []
        in_flight = None
        for frame in frames:
            frame = np.asarray(frame)
            if prev_frame is not None:
                pending.append((prev_frame, frame))
                if len(pending) == batch_pairs:
                    batch = dispatch(pending)      # overlap: dispatch k+1 ...
                    pending = []
                    if in_flight is not None:
                        yield from emit(in_flight, final=False)  # ... drain k
                    in_flight = batch
            prev_frame = frame
        if pending:
            batch = dispatch(pending)
            if in_flight is not None:
                yield from emit(in_flight, final=False)
            in_flight = batch
        if in_flight is not None:
            yield from emit(in_flight, final=True)
        elif prev_frame is not None:
            yield prev_frame                       # 1-frame input passthrough

    def interpolate_video_file(self, in_path: str, out_path: str,
                               factor: int = 2, batch_pairs: int = 8,
                               fps: Optional[float] = None,
                               progress: bool = False,
                               deadline: Optional[float] = None) -> dict:
        """Decode -> interpolate -> encode, all streaming. Returns stats.

        This is the real implementation of the reference's advertised
        ``main.py video`` command (``main.py:118-129``, broken there).

        ``deadline`` (absolute ``time.time()``) aborts the job between
        output frames with ``TimeoutError`` — in-flight device dispatches
        complete normally (aborting device work mid-flight is never safe);
        only further host-side work stops.
        """
        from ..data.video import AsyncVideoReader, AsyncVideoWriter

        grayscale = self.cfg.channels == 1
        reader = AsyncVideoReader(in_path, grayscale=grayscale)
        out_fps = fps if fps is not None else reader.fps * factor
        t0 = time.time()
        n_out = 0
        with AsyncVideoWriter(out_path, fps=out_fps) as writer:
            for frame in self.interpolate_video_frames(
                    iter(reader), factor=factor, batch_pairs=batch_pairs):
                if deadline is not None and time.time() > deadline:
                    raise TimeoutError(
                        f"video job exceeded its deadline after {n_out} "
                        f"output frames")
                writer.write(frame)
                n_out += 1
        dt = time.time() - t0
        return {"input_frames": reader.frame_count, "output_frames": n_out,
                "output_fps": out_fps, "seconds": dt,
                "frames_per_second": n_out / dt if dt > 0 else float("inf")}

    # -- fractional retiming (exact-time models) -----------------------------

    @property
    def supports_exact_time(self) -> bool:
        """True when the model samples arbitrary times in one shot (the flow
        family by construction, or a ``time_conditioned`` U-Net/tower)."""
        return (self.cfg.time_conditioned
                or getattr(self.cfg, "arch", "unet") == "flow")

    def retime_video_frames(self, frames: Iterable[np.ndarray], rate: float,
                            eps: float = 1e-6,
                            batch_pairs: int = 8) -> Iterator[np.ndarray]:
        """Resample a frame stream's TIMELINE by ``rate`` (out/in frame-count
        ratio) — fractional rates welcome: 24->60 fps is ``rate=2.5``.

        Output frame k sits at input time k/rate; when that lands on an
        input frame it passes through losslessly, otherwise the exact
        fractional time is synthesized (one motion pass per input pair for
        the flow family, then one cheap sample per output). This is a
        capability integer-factor interpolation can't express and the
        reference doesn't attempt (its multi-frame mode emits N copies of
        the midpoint, ``model/inference.py:124-149``).

        ``batch_pairs`` consecutive pairs go to the device in ONE dispatch:
        each pair carries its own time vector (padded to the batch's max
        count — fractional rates alternate between floor/ceil counts, so
        padding waste is at most one sample per pair and the jit sees a
        couple of stable shapes).

        Requires an exact-time model (``supports_exact_time``).
        """
        if rate <= 0:
            raise ValueError("rate must be positive")
        if not self.supports_exact_time:
            raise ValueError(
                "retiming requires exact-time sampling: use --arch flow or "
                "a time_conditioned model (bisection models only support "
                "integer factors)")
        it = iter(frames)
        prev = next(it, None)
        if prev is None:
            return
        k = 0          # next output index
        i = 0          # current pair is (frame i, frame i+1)
        jobs: List[Tuple[np.ndarray, np.ndarray, int, List[float]]] = []

        def flush():
            """One device dispatch for every queued pair that needs mids,
            then emit the whole group in time order."""
            need = [j for j in jobs if j[3]]
            mids: dict = {}
            if need:
                m = max(len(j[3]) for j in need)
                f1 = np.stack([j[0] for j in need])
                f2 = np.stack([j[1] for j in need])
                # pad each pair's times to m (repeat last; cropped on emit)
                tmat = np.stack([np.asarray(j[3] + [j[3][-1]] * (m - len(j[3])),
                                            np.float32) for j in need], axis=1)
                out = np.asarray(self._time_fn(m)(
                    self.variables, self._put(f1), self._put(f2),
                    jnp.asarray(tmat)))
                for row, j in enumerate(need):
                    mids[id(j)] = out[row]
            for j in jobs:
                for _ in range(j[2]):
                    yield j[0]
                if j[3]:
                    arr = mids[id(j)]
                    for q in range(len(j[3])):
                        yield arr[q]
            jobs.clear()

        for cur in it:
            ts: List[float] = []
            originals_first = 0
            while True:
                tau = k / rate
                if tau >= i + 1 - eps:
                    break
                t = tau - i
                if t <= eps and not ts:
                    originals_first += 1
                else:
                    ts.append(min(max(t, 0.0), 1.0))
                k += 1
            jobs.append((prev, cur, originals_first, ts))
            if len(jobs) >= batch_pairs:
                yield from flush()
            prev = cur
            i += 1
        yield from flush()
        if k / rate <= i + eps:   # the last input frame is an output sample
            yield prev

    def retime_video_file(self, in_path: str, out_path: str,
                          target_fps: float, batch_pairs: int = 8,
                          deadline: Optional[float] = None) -> dict:
        """Retime a clip to an arbitrary ``target_fps`` (24->60 etc.):
        decode -> exact-time synthesis -> encode, streaming. ``deadline``
        as in ``interpolate_video_file``."""
        from ..data.video import AsyncVideoReader, AsyncVideoWriter

        grayscale = self.cfg.channels == 1
        reader = AsyncVideoReader(in_path, grayscale=grayscale)
        in_fps = reader.fps or 30.0
        rate = target_fps / in_fps
        t0 = time.time()
        n_out = 0
        with AsyncVideoWriter(out_path, fps=target_fps) as writer:
            for frame in self.retime_video_frames(iter(reader), rate,
                                                  batch_pairs=batch_pairs):
                if deadline is not None and time.time() > deadline:
                    raise TimeoutError(
                        f"retime job exceeded its deadline after {n_out} "
                        f"output frames")
                writer.write(frame)
                n_out += 1
        dt = time.time() - t0
        return {"input_frames": reader.frame_count, "output_frames": n_out,
                "input_fps": in_fps, "output_fps": target_fps, "rate": rate,
                "seconds": dt,
                "frames_per_second": n_out / dt if dt > 0 else float("inf")}

    # -- comparison baseline -------------------------------------------------

    @staticmethod
    def linear_transition_frames(f1: np.ndarray, f2: np.ndarray,
                                 num: int) -> List[np.ndarray]:
        """Alpha-blend sequence (reference ``create_smooth_transition_frames``,
        ``model/inference.py:151-174``) — the comparison baseline."""
        out = []
        for i in range(1, num + 1):
            a = i / (num + 1)
            out.append(np.clip((1 - a) * f1.astype(np.float32) +
                               a * f2.astype(np.float32), 0, 255).astype(np.uint8))
        return out
