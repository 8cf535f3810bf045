"""Fused Pallas SSIM kernel (skimage semantics) for batched on-device eval.

The XLA path (``ops/ssim.py:ssim_eval``) lowers to 10 separable depthwise
convolutions plus an elementwise chain — each a full HBM round trip over the
image. This kernel keeps one image pair resident in VMEM and produces the
per-image SSIM scalar in a single pass: the 7x7 uniform-window sums are 14
shifted adds on the VPU, the SSIM algebra is fused, and only two uint8 images
ever cross HBM.

Scope: per-image grid (one image pair per program), uint8 inputs, C=1
(grayscale eval — the reference's metric path, ``evaluation_simple.py:103-109``).
Images must fit VMEM (~<= 720p grayscale); ``ssim_eval_auto`` dispatches to
the XLA path otherwise. Matches the XLA implementation to ~1e-5 (tested in
``tests/test_pallas_ssim.py``, interpret mode on CPU + compiled on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

WIN = 7
_VMEM_IMAGE_LIMIT_BYTES = 1300 * 760  # whole-pair-in-VMEM cutoff (~720p gray)


def _window_sums(x, win: int):
    """[H, W] -> [H-win+1, W-win+1] sliding-window sums via shifted adds."""
    h, w = x.shape
    rows = x[:, 0:w - win + 1]
    for d in range(1, win):
        rows = rows + x[:, d:w - win + 1 + d]
    out = rows[0:h - win + 1, :]
    for d in range(1, win):
        out = out + rows[d:h - win + 1 + d, :]
    return out


def _ssim_kernel(x_ref, y_ref, o_ref, *, data_range: float):
    x = x_ref[0].astype(jnp.float32)
    y = y_ref[0].astype(jnp.float32)
    n = float(WIN * WIN)
    sx = _window_sums(x, WIN)
    sy = _window_sums(y, WIN)
    sxx = _window_sums(x * x, WIN)
    syy = _window_sums(y * y, WIN)
    sxy = _window_sums(x * y, WIN)
    ux = sx / n
    uy = sy / n
    cov_norm = 1.0 / (n - 1.0)
    vx = (sxx - sx * ux) * cov_norm
    vy = (syy - sy * uy) * cov_norm
    vxy = (sxy - sx * uy) * cov_norm
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
        (ux * ux + uy * uy + c1) * (vx + vy + c2))
    o_ref[0, 0] = jnp.mean(s)


@functools.partial(jax.jit, static_argnames=("data_range", "interpret"))
def ssim_eval_fused(img1: jax.Array, img2: jax.Array,
                    data_range: float = 255.0,
                    interpret: bool = False) -> jax.Array:
    """[B,H,W,1] (or [B,H,W]) pairs -> [B] SSIM, one fused pass per image."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if img1.ndim == 4:
        img1 = img1[..., 0]
        img2 = img2[..., 0]
    b, h, w = img1.shape
    out = pl.pallas_call(
        functools.partial(_ssim_kernel, data_range=data_range),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        interpret=interpret,
    )(img1, img2)
    return out[:, 0]


def fits_vmem(shape) -> bool:
    """Whole-pair-in-VMEM eligibility for the fused kernel."""
    h, w, c = shape[-3], shape[-2], shape[-1]
    return c == 1 and h * w <= _VMEM_IMAGE_LIMIT_BYTES


_TILE_ROWS = 64        # valid-output rows per tile in the tiled kernel
_TILED_W_LIMIT = 4096  # per-tile row width the VMEM budget allows (~4K video)


def _ssim_tiled_kernel(x_hbm, y_hbm, o_ref, *, data_range: float,
                       tile: int, height: int, width: int):
    """One (image, row-tile) program: DMA the tile + 6-row halo from HBM,
    compute the SSIM map for this tile's valid rows, accumulate the sum."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bi = pl.program_id(0)
    ti = pl.program_id(1)
    rows = tile + WIN - 1
    # clamp the tile start so the DMA stays in bounds; the overlap that the
    # clamp introduces on the last tile is masked out of the sum below
    start = jnp.minimum(ti * tile, height - rows)
    local_skip = ti * tile - start            # valid rows we already counted
    rows_valid = jnp.minimum(tile, (height - WIN + 1) - ti * tile)

    def body(xs, ys, sem):
        cx = pltpu.make_async_copy(x_hbm.at[bi, pl.ds(start, rows), :],
                                   xs, sem.at[0])
        cy = pltpu.make_async_copy(y_hbm.at[bi, pl.ds(start, rows), :],
                                   ys, sem.at[1])
        cx.start()
        cy.start()
        cx.wait()
        cy.wait()
        x = xs[:].astype(jnp.float32)
        y = ys[:].astype(jnp.float32)
        n = float(WIN * WIN)
        sx = _window_sums(x, WIN)
        sy = _window_sums(y, WIN)
        sxx = _window_sums(x * x, WIN)
        syy = _window_sums(y * y, WIN)
        sxy = _window_sums(x * y, WIN)
        ux = sx / n
        uy = sy / n
        cov_norm = 1.0 / (n - 1.0)
        vx = (sxx - sx * ux) * cov_norm
        vy = (syy - sy * uy) * cov_norm
        vxy = (sxy - sx * uy) * cov_norm
        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
            (ux * ux + uy * uy + c1) * (vx + vy + c2))
        r = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        mask = (r >= local_skip) & (r < local_skip + rows_valid)
        part = jnp.sum(jnp.where(mask, s, 0.0))

        # the per-image accumulator is a (1, 8, 128) VMEM block revisited by
        # every row-tile program of the same image (Mosaic requires the
        # trailing block dims to be sublane/lane aligned under a 2-D grid);
        # only element [0, 0] carries the sum
        @pl.when(ti == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        sub = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 128), 2)
        o_ref[...] += jnp.where((sub == 0) & (lane == 0), part, 0.0)

    pl.run_scoped(
        body,
        pltpu.VMEM((rows, width), jnp.uint8),
        pltpu.VMEM((rows, width), jnp.uint8),
        pltpu.SemaphoreType.DMA((2,)),
    )


@functools.partial(jax.jit, static_argnames=("data_range", "interpret"))
def ssim_eval_tiled(img1: jax.Array, img2: jax.Array,
                    data_range: float = 255.0,
                    interpret: bool = False) -> jax.Array:
    """Row-tiled fused SSIM for images too large for whole-pair-in-VMEM
    (1080p/4K): grid over (image, row-tile), each tile DMA'd from HBM with a
    ``WIN-1``-row halo, per-image window sums accumulated across tiles."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if img1.ndim == 4:
        img1 = img1[..., 0]
        img2 = img2[..., 0]
    b, h, w = img1.shape
    n_valid_rows = h - WIN + 1
    nt = pl.cdiv(n_valid_rows, _TILE_ROWS)
    sums = pl.pallas_call(
        functools.partial(_ssim_tiled_kernel, data_range=data_range,
                          tile=_TILE_ROWS, height=h, width=w),
        grid=(b, nt),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 8, 128), jnp.float32),
        interpret=interpret,
    )(img1, img2)
    return sums[:, 0, 0] / (n_valid_rows * (w - WIN + 1))


def tiled_eligible(shape) -> bool:
    """Eligibility for the row-tiled kernel: grayscale, tall enough for one
    tile + halo, row width within the per-tile VMEM budget."""
    h, w, c = shape[-3], shape[-2], shape[-1]
    return (c == 1 and h >= _TILE_ROWS + WIN - 1 and w <= _TILED_W_LIMIT
            and w >= WIN)


def ssim_eval_auto(img1, img2, data_range: float = 255.0):
    """Fused Pallas kernel when eligible (TPU, grayscale): whole-pair-in-VMEM
    up to ~720p, row-tiled above that (1080p/4K); otherwise the XLA separable
    path. Same numerics (~1e-5) on every route."""
    from ..ssim import ssim_eval

    arr1 = jnp.asarray(img1)
    on_accel = (arr1.ndim == 4 and arr1.shape[-1] == 1 and
                jax.devices()[0].platform not in ("cpu",))
    if on_accel:
        try:
            if fits_vmem(arr1.shape):
                return ssim_eval_fused(arr1, jnp.asarray(img2),
                                       data_range=data_range)
            if tiled_eligible(arr1.shape):
                return ssim_eval_tiled(arr1, jnp.asarray(img2),
                                       data_range=data_range)
        except Exception:   # unsupported platform/layout -> XLA fallback
            pass
    return ssim_eval(img1, img2, data_range=data_range)
