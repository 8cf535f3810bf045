"""Fused flow-sampler kernel: both shifts-warps + time-weighted blend in one
row-tiled Pallas program.

Under XLA the flow family's sampler
(``models/flow.py:FlowInterpolator.sample``, single-field path) runs as two
separable shifts-warps (``ops/warp.py:_warp_axis_shifts`` — X pass then Y
pass per warp, ``2*(2*max_flow + 2)`` statically shifted copies each) plus
an elementwise blend. Even with the chained-barrier accumulation schedule
that costs ~1.1 ms per 1080p warp (docs/PERF.md): every 8-term partial sum
round-trips a frame-sized tensor through HBM, and the X and Y passes each
materialize a full intermediate frame. This kernel keeps one row tile of
everything in VMEM and runs all four 1-D passes plus the blend before
anything touches HBM again:

- HBM traffic per sampled frame drops from ~15 frame-sized tensors to the
  irreducible set: read f1, f2, flow (2 ch), mask once, write g0, g1, out
  once (g0/g1 feed the refinement head).
- Shift semantics are IDENTICAL to ``warp_impl="shifts"`` (same per-axis
  clamp, border replicate, source-row X sampling) but computed in f32 —
  the XLA production path interpolates in bf16, so outputs agree to bf16
  tolerance, not bitwise.

Layout notes (hard-won in the refine/SSIM kernels, CLAUDE.md):

- Row DMA extents must be 8-aligned: the tile + warp halo (``th + 2*rmax +
  1`` rows) is rounded up to 8 and the padded source arrays are extended so
  the last tile's DMA stays in bounds.
- The X pass needs an edge-replicated, lane-padded row: each tile writes its
  rows into a ``(rows8, Wp)`` VMEM scratch (``Wp = W + 2*rmax + 1`` rounded
  up to 128 lanes) and the 66 shifted copies become static lane slices.
- Y-axis border replicate is prepaid in XLA: the images and the X
  displacement field are row-padded with ``rmax`` edge rows before the call,
  so the kernel never special-cases the first/last tile.

Reference capability line: the reference's only warp is the host-side
Farneback baseline (``model/evaluation.py:142-192``); this kernel is the
TPU-native production path of the learned equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _axis_weights(pos, grid, k: int):
    """Per-pixel weight of shift offset ``k`` for clamped position ``pos``
    (f32): bilinear hat on the two offsets straddling ``pos`` — exactly
    ``ops/warp.py:_warp_axis_shifts``'s select pair."""
    k0 = jnp.floor(pos)
    frac = pos - k0
    rel = k0 - grid
    return (jnp.where(rel == k, 1.0 - frac, 0.0)
            + jnp.where(rel == k - 1, frac, 0.0))


def _warp_tiles_x(tiles, fx_rows, scale, rmax: int, width: int):
    """X pass over per-channel (rows, W) tiles sharing one displacement
    field: out[r, x] = img[r, x + clip(s*fx)]. The shift weights (the bulk
    of the VPU work) are computed ONCE per offset and applied to every
    channel — RGB costs ~1.5x gray, not 3x."""
    ftx = jnp.clip(scale * fx_rows, -rmax, rmax)
    # Mosaic's tpu.iota is integer-only — build int32 and cast
    grid = jax.lax.broadcasted_iota(jnp.int32, ftx.shape, 1
                                    ).astype(jnp.float32)
    pos = jnp.clip(grid + ftx, 0.0, width - 1)
    # edge-replicated lane padding (value, not scratch — Mosaic sizes it).
    # The padded copies stay in the IMAGE dtype (bf16 in production):
    # padding/slicing is pure data movement, the upcast happens at the
    # multiply — halves the biggest scoped-VMEM temporaries for free.
    rows = tiles[0].shape[0]
    padded = [jnp.concatenate(
        [jnp.broadcast_to(img[:, :1], (rows, rmax)), img,
         jnp.broadcast_to(img[:, width - 1:width], (rows, rmax + 1))],
        axis=1) for img in tiles]
    outs = [jnp.zeros((rows, width), jnp.float32) for _ in tiles]
    for k in range(-rmax, rmax + 2):
        w = _axis_weights(pos, grid, k)
        outs = [o + jax.lax.slice_in_dim(p, rmax + k, rmax + k + width,
                                         axis=1).astype(jnp.float32) * w
                for o, p in zip(outs, padded)]
    return outs


def _warp_tiles_y(hxs, fy_tile, scale, rmax: int, height: int, r0, th: int):
    """Y pass: output rows [r0, r0+th) from X-warped rows hx (tile-local,
    row j of the output reads hx rows [j, j + 2*rmax + 1]); one weight
    field shared across channels, as in the X pass."""
    fty = jnp.clip(scale * fy_tile, -rmax, rmax)
    grid = (jax.lax.broadcasted_iota(jnp.int32, fty.shape, 0
                                     ).astype(jnp.float32)
            + r0.astype(jnp.float32))
    pos = jnp.clip(grid + fty, 0.0, height - 1)
    outs = [jnp.zeros_like(fty) for _ in hxs]
    for k in range(-rmax, rmax + 2):
        w = _axis_weights(pos, grid, k)
        outs = [o + jax.lax.slice_in_dim(hx, rmax + k, rmax + k + th,
                                         axis=0) * w
                for o, hx in zip(outs, hxs)]
    return outs


def _sampler_kernel(t_ref, f1_hbm, f2_hbm, fx_hbm, fy_ref, mask_ref,
                    g0_ref, g1_ref, out_ref, *, th: int, rmax: int,
                    height: int, width: int, nc: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    rows = _round_up(th + 2 * rmax + 1, 8)
    r0 = ti * th                      # padded-array row of output row r0

    def body(f1s, f2s, fxs, sem):
        # per-channel row DMAs from the channels-first padded images; one
        # shared DMA for the X displacement rows
        copies = [pltpu.make_async_copy(
            f1_hbm.at[bi, ch, pl.ds(r0, rows), :], f1s.at[ch], sem.at[ch])
            for ch in range(nc)]
        copies += [pltpu.make_async_copy(
            f2_hbm.at[bi, ch, pl.ds(r0, rows), :], f2s.at[ch],
            sem.at[nc + ch]) for ch in range(nc)]
        copies.append(pltpu.make_async_copy(
            fx_hbm.at[bi, pl.ds(r0, rows), :], fxs, sem.at[2 * nc]))
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        t = t_ref[bi, 0]
        s0 = -t                       # g0 warps f1 by -t * flow
        s1 = 1.0 - t                  # g1 warps f2 by (1-t) * flow
        fx = fxs[:].astype(jnp.float32)
        fy = fy_ref[0].astype(jnp.float32)
        m = mask_ref[0].astype(jnp.float32)
        w0 = (1.0 - t) * m
        w1 = t * (1.0 - m)
        den = w0 + w1 + 1e-6
        # warps run sequentially (g0 fully written before hx1 exists) to
        # bound VMEM liveness — the halo-row intermediates are the big
        # tensors and only one warp's set is alive at a time
        hx0 = _warp_tiles_x([f1s[ch] for ch in range(nc)], fx, s0, rmax,
                            width)
        g0 = _warp_tiles_y(hx0, fy, s0, rmax, height, r0, th)
        for ch in range(nc):
            g0_ref[0, ch] = g0[ch]
        hx1 = _warp_tiles_x([f2s[ch] for ch in range(nc)], fx, s1, rmax,
                            width)
        g1 = _warp_tiles_y(hx1, fy, s1, rmax, height, r0, th)
        for ch in range(nc):
            g1_ref[0, ch] = g1[ch]
            out_ref[0, ch] = (w0 * g0[ch] + w1 * g1[ch]) / den

    pl.run_scoped(
        body,
        pltpu.VMEM((nc, rows, width), f1_hbm.dtype),
        pltpu.VMEM((nc, rows, width), f2_hbm.dtype),
        pltpu.VMEM((rows, width), fx_hbm.dtype),
        pltpu.SemaphoreType.DMA((2 * nc + 1,)),
    )


_TILE_ROWS = 64
_TILE_ROWS_RGB = 16   # halo intermediates triple with channels; keep the
                      # working set inside ~16 MB VMEM (pallas guide)


def eligible(cfg, channels_last_shape) -> bool:
    """Kernel eligibility: single-field flow (no bidir), shifts warp,
    gray or RGB frames, rows enough for one tile."""
    h, w, c = channels_last_shape[-3:]
    return (not cfg.flow_bidir and cfg.warp_impl == "shifts" and c in (1, 3)
            and h >= 8 and w >= 2 * cfg.max_flow + 2 and w <= 8192)


@functools.partial(jax.jit,
                   static_argnames=("max_flow", "tile_rows", "interpret"))
def sample_fused(f1: jax.Array, f2: jax.Array, flow: jax.Array,
                 mask: jax.Array, t: jax.Array, max_flow: int = 32,
                 tile_rows: int = 0,
                 interpret: bool = False):
    """Fused single-field flow sampler (shifts semantics, f32 math).

    Parameters: ``f1, f2`` [B,H,W,C] (C = 1 or 3, any float dtype),
    ``flow`` [B,H,W,2] (x then y displacement, pixels), ``mask`` [B,H,W,1]
    blend weight in [0,1], ``t`` [B] sample times. Returns
    ``(out, g0, g1)`` — each [B,H,W,C] f32: the blended frame and the two
    warped candidates (the refinement head consumes all three).

    Multi-channel layout: images are transposed to channels-first for the
    kernel so each channel's rows are a contiguous DMA; the warp weight
    fields are computed once per shift offset and shared across channels.
    ``tile_rows=0`` picks the default (64 gray / 16 RGB — VMEM budget).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = f1.shape
    rmax = int(max_flow)
    if tile_rows <= 0:
        tile_rows = _TILE_ROWS if c == 1 else _TILE_ROWS_RGB
        if w > 2048:
            # the unrolled shift accumulation's temporaries are
            # (th + 2*max_flow + 1, W) f32: at 4K width the 1080p tile
            # overruns physical VMEM (measured 141 MB vs the chip's
            # 128 MB); shrink the tile so the halo rows dominate less
            tile_rows = 16 if c == 1 else 8
    th = min(tile_rows, _round_up(h, 8))
    nt = pl.cdiv(h, th)
    rows = _round_up(th + 2 * rmax + 1, 8)
    # Row-pad once in XLA so every tile's halo DMA is in bounds and Y border
    # replicate is free: padded row r maps to image row r - rmax.
    pad_lo = rmax
    pad_hi = (nt - 1) * th + rows - rmax - h
    def rowpad(x):
        return jnp.pad(x, ((0, 0), (pad_lo, pad_hi), (0, 0)), mode="edge")

    # channels-first so the per-channel halo DMA is a contiguous row block
    def chanpad(x):
        return jnp.pad(jnp.moveaxis(x, 3, 1),
                       ((0, 0), (0, 0), (pad_lo, pad_hi), (0, 0)),
                       mode="edge")

    f1p = chanpad(f1)
    f2p = chanpad(f2)
    fxp = rowpad(flow[..., 0].astype(jnp.float32))
    fy = flow[..., 1].astype(jnp.float32)
    m2 = mask[..., 0].astype(jnp.float32)
    t2 = jnp.reshape(t.astype(jnp.float32), (b, 1))

    grid = (b, nt)

    def tile_spec():
        return pl.BlockSpec((1, th, w), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)

    def out_spec():
        return pl.BlockSpec((1, c, th, w), lambda i, j: (i, 0, j, 0),
                            memory_space=pltpu.VMEM)

    # The unrolled 2*(2*rmax+2)-term shift accumulation keeps many
    # (rows, W) f32 temporaries live — Mosaic's measured scoped stack at
    # gray 1080p/th64/mf32 is ~73 MB, far past its 16 MB default limit
    # (physical VMEM is larger; the refine kernel runs 4K at a raised cap
    # too). Raise unconditionally.
    kwargs = {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}
    g0, g1, out = pl.pallas_call(
        functools.partial(_sampler_kernel, th=th, rmax=rmax, height=h,
                          width=w, nc=c),
        grid=grid,
        in_specs=[
            # full-array SMEM block: Mosaic requires block dims == array
            # dims (or 8/128-divisible) — a (1,1) block of a (b,1) array
            # only compiles at b == 1 (TPU-only failure; interpret mode
            # does not enforce it). Kernel indexes rows by program_id.
            pl.BlockSpec((b, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            tile_spec(),
            tile_spec(),
        ],
        out_specs=[out_spec(), out_spec(), out_spec()],
        out_shape=[jax.ShapeDtypeStruct((b, c, nt * th, w), jnp.float32)
                   for _ in range(3)],
        interpret=interpret,
        **kwargs,
    )(t2, f1p, f2p, fxp, fy, m2)
    crop = lambda x: jnp.moveaxis(x[:, :, :h, :], 1, 3)
    return (crop(out), crop(g0), crop(g1))
