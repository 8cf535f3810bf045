"""Fused Pallas double-conv block for the U-Net core (probe stage).

The s2d U-Net core spends its HBM traffic on DoubleConv blocks
(``models/unet.py:128-176``, mirroring reference ``model/unet.py:5-21``):
each ``conv3x3 -> relu -> conv3x3 -> relu`` pair round-trips its mid
activation through HBM, and ``docs/hlo_attribution.json`` shows the conv
fusions dominating the production dispatch (76 of 105 GB at b128 1080p).
This kernel keeps the mid activation VMEM-resident: one row-tiled program
computes both convs, reading the input once and writing only the output.

Layout: row-major ``[B, H, C, W]`` — image width on lanes, channels on
sublanes (the transposed layout of CLAUDE.md finding 11). W pads to the
128-lane grid once for the whole core (480 -> 512 is 6.7%) and C pads to
8 sublanes (0% at every core width), where XLA's NHWC puts channels on
lanes. Each frame row is a contiguous (C, W) block, so row windows DMA
transpose-free in both directions and a row reference ``xt[r]`` is a
clean 2-D operand.

The key structural trick vs ``refine_fused.py``: a dense channel
contraction is lane-wise, so horizontal taps COMMUTE with the matmul —
``W @ roll(x) == roll(W @ x)`` — and each conv needs only 3 MXU passes
per output row (one per kx, the 3 ky rows packed on the contraction axis:
``(cout, 3*cin) @ (3*cin, W)``) plus 2 lane-rolls of the SMALL
``(cout, W)`` f32 partial sums. No rotated input copies at all (the
refine kernel's im2col-concat approach exists because its inputs are 3-5
thin planes, where per-kx matmuls would waste the MXU's K dim; at core
widths K = 3*cin >= 96 is already dense).

Border semantics match SAME zero-padding: out-of-image halo rows are
zeroed in scratch, lane masks kill the circular wrap columns at the
image edge, and padded lanes (>= the true width) are re-zeroed after
every bias+relu so they contribute nothing downstream.

Status: probe-stage machinery (``scripts/dconv_probe.py`` measures it
against XLA's conv pair at core shapes on the TPU; integration into the
model is gated on that A/B). Interpret-mode parity with the Flax math is
pinned in ``tests/test_dconv_fused.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_TH = 16


def _tile_h(h: int) -> int:
    return _TH if h % _TH == 0 else 8


def eligible(shape) -> bool:
    """[B, H, C, W]: H 8-row-tileable, C a sublane multiple, W lane-tiled."""
    if len(shape) != 4:
        return False
    h, c, w = shape[-3], shape[-2], shape[-1]
    return h >= 8 and h % 8 == 0 and c % 8 == 0 and w >= 128 and w % 128 == 0


def _roll_f32(x: jax.Array, kx: int, wp: int):
    """Lane-rotate so lane w holds the unrolled lane w + kx - 1."""
    from jax.experimental.pallas import tpu as pltpu

    if kx == 1:
        return x
    return pltpu.roll(x, (wp - (kx - 1)) % wp, axis=1)


def _kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, o_hbm, xt, z1m, ot, sems,
            *, th: int, height: int, pad_h: int, width: int, wp: int,
            cin: int, mid: int, cout: int, cdt, relu2: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * th
    ntiles = pad_h // th

    # frame rows [r0-2, r0+th+2) into xt[0:th+4]: slicing the third-minor
    # (H) dim needs no 8-alignment — each row is a whole (C, W) tile block.
    # Border tiles fetch nothing for out-of-image halo rows; those scratch
    # rows are zeroed below (SAME-conv zero padding).
    body = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r0, th), :, :], xt.at[pl.ds(2, th)], sems.at[0])
    body.start()

    @pl.when(i > 0)
    def _():
        c = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r0 - 2, 2), :, :], xt.at[pl.ds(0, 2)],
            sems.at[1])
        c.start()
        c.wait()

    @pl.when(i < ntiles - 1)
    def _():
        c = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(r0 + th, 2), :, :], xt.at[pl.ds(th + 2, 2)],
            sems.at[2])
        c.start()
        c.wait()

    body.wait()

    @pl.when(i == 0)
    def _():
        xt[0] = jnp.zeros((cin, wp), xt.dtype)
        xt[1] = jnp.zeros((cin, wp), xt.dtype)

    @pl.when(i == ntiles - 1)
    def _():
        xt[th + 2] = jnp.zeros((cin, wp), xt.dtype)
        xt[th + 3] = jnp.zeros((cin, wp), xt.dtype)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    edge = width == wp      # no padded lanes -> circular wraps need masks

    def conv_row(w_ref, b_ref, rhs, do_relu):
        """One output row: 3 MXU passes (kx classes, ky-packed contraction)
        with the two off-center partial sums lane-rolled into place.
        ``rhs`` is the (3*cin', wp) stack of the 3 ky input rows."""
        acc = None
        for kx in range(3):
            d = jax.lax.dot_general(
                w_ref[kx], rhs, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # (nout, wp)
            d = _roll_f32(d, kx, wp)
            if edge and kx == 0:
                d = jnp.where(lane_i == 0, jnp.zeros_like(d), d)
            elif edge and kx == 2:
                d = jnp.where(lane_i == wp - 1, jnp.zeros_like(d), d)
            acc = d if acc is None else acc + d
        out = acc.astype(cdt) + b_ref[...]
        if do_relu:
            out = jax.nn.relu(out)
        # padded lanes must stay exactly zero (bias/relu would leak them
        # into the next conv's off-center taps via the roll)
        return jnp.where(lane_i < width, out, jnp.zeros_like(out))

    # all th+2 z1 rows of the tile, contiguous: both convs' contraction
    # stacks are then slice + leading-dim collapse (no concat copies)
    for r in range(-1, th + 1):
        rhs = xt[pl.ds(2 + r - 1, 3)].reshape(3 * cin, wp)
        row = conv_row(w1_ref, b1_ref, rhs, True)
        fr = r0 + r
        ok = (fr >= 0) & (fr < height)
        z1m[r + 1] = jnp.where(ok, row, jnp.zeros_like(row))
    for t in range(th):
        ot[t] = conv_row(w2_ref, b2_ref,
                         z1m[pl.ds(t, 3)].reshape(3 * mid, wp), relu2)

    out_dma = pltpu.make_async_copy(
        ot, o_hbm.at[b, pl.ds(r0, th), :, :], sems.at[3])
    out_dma.start()
    out_dma.wait()


@functools.partial(jax.jit,
                   static_argnames=("relu2", "compute_dtype", "interpret",
                                    "image_width", "image_height"))
def double_conv_fused(x: jax.Array, w1: jax.Array, b1: jax.Array,
                      w2: jax.Array, b2: jax.Array, relu2: bool = True,
                      compute_dtype=jnp.bfloat16,
                      image_width: int | None = None,
                      image_height: int | None = None,
                      interpret: bool = False) -> jax.Array:
    """relu(conv3x3(relu(conv3x3(x) + b1)) + b2), row-major transposed.

    x  : [B, H, C, W] in ``compute_dtype``; W a 128 multiple (callers pad
         columns >= the true image width with ZEROS), H an 8 multiple.
    w1 : (3, 3, cin, mid) Flax HWIO kernel;  b1 : (mid,)
    w2 : (3, 3, mid, cout);                  b2 : (cout,)
    relu2: apply the trailing ReLU (every DoubleConv does; off = a bare
         conv-pair timing mode for the probe).
    image_width: the TRUE image width (SAME-conv border column); defaults
         to the full lane width. The kernel zeroes every lane >= it after
         each bias+relu so padded lanes never feed the off-center taps.
    image_height: the TRUE image height; defaults to H. Lets odd-height
         core levels (68, 34...) run by zero-padding rows up to an
         8-multiple: rows >= it are masked to zero inside the kernel and
         the caller slices them off the output.
    returns [B, H, cout, W] in ``compute_dtype``.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cdt = compute_dtype
    bsz, h, cin, wp = x.shape
    wd = int(image_width) if image_width is not None else wp
    hd = int(image_height) if image_height is not None else h
    mid, cout = int(w1.shape[-1]), int(w2.shape[-1])
    th = _tile_h(h)

    # per-kx weights with the 3 ky taps packed on the contraction axis:
    # (kx, nout, 3*cin), contraction ordered ky-major/channel-minor to
    # match the kernel's concat of 3 consecutive (cin, W) input rows
    def prep(wk, nin, nout):
        wt = jnp.asarray(wk).transpose(1, 0, 2, 3)     # (kx, ky, cin, cout)
        return wt.reshape(3, 3 * nin, nout).transpose(0, 2, 1).astype(cdt)

    w1g = prep(w1, cin, mid)
    w2g = prep(w2, mid, cout)
    b1c = jnp.asarray(b1).reshape(mid, 1).astype(cdt)
    b2c = jnp.asarray(b2).reshape(cout, 1).astype(cdt)

    kwargs = {}
    itemsize = jnp.dtype(cdt).itemsize
    vmem_need = ((th + 4) * cin + (th + 2) * mid + th * cout) * wp * itemsize
    if vmem_need > 12 * 1024 * 1024:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, height=hd, pad_h=h, width=wd,
                          wp=wp, cin=cin, mid=mid, cout=cout, cdt=cdt,
                          relu2=relu2),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # x
            pl.BlockSpec((3, mid, 3 * cin), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # w1g
            pl.BlockSpec((mid, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),              # b1
            pl.BlockSpec((3, cout, 3 * mid), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # w2g
            pl.BlockSpec((cout, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),              # b2
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h, cout, wp), cdt),
        scratch_shapes=[
            pltpu.VMEM((th + 4, cin, wp), cdt),                 # xt
            pltpu.VMEM((th + 2, mid, wp), cdt),                 # z1 rows
            pltpu.VMEM((th, cout, wp), cdt),                    # ot
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        **kwargs,
    )(x, w1g, b1c, w2g, b2c)
    return out


def double_conv_reference(x_nhwc: jax.Array, w1, b1, w2, b2,
                          relu2: bool = True,
                          compute_dtype=jnp.bfloat16) -> jax.Array:
    """The same math as XLA lowers it from Flax NHWC (the A/B baseline:
    ``lax.conv_general_dilated`` exactly as ``nn.Conv`` emits it)."""
    cdt = compute_dtype
    dn = jax.lax.conv_dimension_numbers(
        x_nhwc.shape, (3, 3, x_nhwc.shape[-1], int(w1.shape[-1])),
        ("NHWC", "HWIO", "NHWC"))

    def conv(v, wk, bk, act):
        y = jax.lax.conv_general_dilated(
            v.astype(cdt), jnp.asarray(wk).astype(cdt), (1, 1), "SAME",
            dimension_numbers=dn)
        y = y + jnp.asarray(bk).astype(cdt)
        return jax.nn.relu(y) if act else y

    return conv(conv(x_nhwc, w1, b1, True), w2, b2, relu2)


def _up_kernel(skip_hbm, low_hbm, mw_ref, w1s_ref, w1u_ref, b1_ref,
               w2_ref, b2_ref, o_hbm, xs, xl, xlu, xu, z1m, ot, sems,
               *, th: int, height: int, width: int, wp: int, wp2: int,
               cs: int, cu: int, mid: int, cout: int, cdt, relu2: bool):
    """Fused decoder up-block: 2x upsample (half-pixel) of ``low`` + skip
    concat + double conv, all VMEM-resident. See :func:`up_double_conv_fused`."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * th
    ntiles = height // th
    th2 = th // 2
    l0 = r0 // 2            # first body low row of this tile

    # skip rows [r0-2, r0+th+2) -> xs[0:th+4] (same plan as _kernel)
    body_s = pltpu.make_async_copy(
        skip_hbm.at[b, pl.ds(r0, th), :, :], xs.at[pl.ds(2, th)], sems.at[0])
    body_s.start()
    # low rows [l0-2, l0+th2+2) -> xl[0:th2+4]; border tiles replicate the
    # edge row afterwards (H-lerp clamps, unlike the convs' zero pad)
    body_l = pltpu.make_async_copy(
        low_hbm.at[b, pl.ds(l0, th2), :, :], xl.at[pl.ds(2, th2)], sems.at[3])
    body_l.start()

    @pl.when(i > 0)
    def _():
        c = pltpu.make_async_copy(
            skip_hbm.at[b, pl.ds(r0 - 2, 2), :, :], xs.at[pl.ds(0, 2)],
            sems.at[1])
        c.start()
        c.wait()
        c = pltpu.make_async_copy(
            low_hbm.at[b, pl.ds(l0 - 2, 2), :, :], xl.at[pl.ds(0, 2)],
            sems.at[4])
        c.start()
        c.wait()

    @pl.when(i < ntiles - 1)
    def _():
        c = pltpu.make_async_copy(
            skip_hbm.at[b, pl.ds(r0 + th, 2), :, :], xs.at[pl.ds(th + 2, 2)],
            sems.at[2])
        c.start()
        c.wait()
        c = pltpu.make_async_copy(
            low_hbm.at[b, pl.ds(l0 + th2, 2), :, :],
            xl.at[pl.ds(th2 + 2, 2)], sems.at[5])
        c.start()
        c.wait()

    body_s.wait()
    body_l.wait()

    @pl.when(i == 0)
    def _():
        xs[0] = jnp.zeros((cs, wp), xs.dtype)
        xs[1] = jnp.zeros((cs, wp), xs.dtype)
        # H-lerp edge clamp: low[-1] reads low[0] (slot 2)
        xl[0] = xl[2]
        xl[1] = xl[2]

    @pl.when(i == ntiles - 1)
    def _():
        xs[th + 2] = jnp.zeros((cs, wp), xs.dtype)
        xs[th + 3] = jnp.zeros((cs, wp), xs.dtype)
        xl[th2 + 2] = xl[th2 + 1]
        xl[th2 + 3] = xl[th2 + 1]

    # W-upsample every low row once on the MXU: (cu, wp2) @ (wp2, wp);
    # mw's zero rows/cols keep padded lanes exactly zero
    mw = mw_ref[...]
    for s in range(th2 + 4):
        d = jax.lax.dot_general(
            xl[s], mw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xlu[s] = d.astype(cdt)

    # H-lerp (half-pixel, f32 accumulation like ops/resize): tile rows are
    # parity-static because r0 = i*th with th even. Up rows that fall
    # outside the image are zeroed after (conv zero-pad semantics).
    for r in range(-2, th + 2):
        if r % 2 == 0:
            a, bslot, wa = r // 2 + 1, r // 2 + 2, 0.25
        else:
            a, bslot, wa = (r - 1) // 2 + 2, (r - 1) // 2 + 3, 0.75
        row = (wa * xlu[a].astype(jnp.float32)
               + (1.0 - wa) * xlu[bslot].astype(jnp.float32))
        xu[r + 2] = row.astype(cdt)

    @pl.when(i == 0)
    def _():
        xu[0] = jnp.zeros((cu, wp), xu.dtype)
        xu[1] = jnp.zeros((cu, wp), xu.dtype)

    @pl.when(i == ntiles - 1)
    def _():
        xu[th + 2] = jnp.zeros((cu, wp), xu.dtype)
        xu[th + 3] = jnp.zeros((cu, wp), xu.dtype)

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, wp), 1)
    edge = width == wp

    def conv_row(w_refs, rhss, b_ref, do_relu):
        acc = None
        for kx in range(3):
            d = None
            for w_ref, rhs in zip(w_refs, rhss):
                t = jax.lax.dot_general(
                    w_ref[kx], rhs,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                d = t if d is None else d + t
            d = _roll_f32(d, kx, wp)
            if edge and kx == 0:
                d = jnp.where(lane_i == 0, jnp.zeros_like(d), d)
            elif edge and kx == 2:
                d = jnp.where(lane_i == wp - 1, jnp.zeros_like(d), d)
            acc = d if acc is None else acc + d
        out = acc.astype(cdt) + b_ref[...]
        if do_relu:
            out = jax.nn.relu(out)
        return jnp.where(lane_i < width, out, jnp.zeros_like(out))

    for r in range(-1, th + 1):
        rhs_s = xs[pl.ds(2 + r - 1, 3)].reshape(3 * cs, wp)
        rhs_u = xu[pl.ds(2 + r - 1, 3)].reshape(3 * cu, wp)
        row = conv_row((w1s_ref, w1u_ref), (rhs_s, rhs_u), b1_ref, True)
        fr = r0 + r
        ok = (fr >= 0) & (fr < height)
        z1m[r + 1] = jnp.where(ok, row, jnp.zeros_like(row))
    for t in range(th):
        ot[t] = conv_row((w2_ref,),
                         (z1m[pl.ds(t, 3)].reshape(3 * mid, wp),),
                         b2_ref, relu2)

    out_dma = pltpu.make_async_copy(
        ot, o_hbm.at[b, pl.ds(r0, th), :, :], sems.at[6])
    out_dma.start()
    out_dma.wait()


@functools.partial(jax.jit,
                   static_argnames=("relu2", "compute_dtype", "interpret",
                                    "image_width"))
def up_double_conv_fused(skip: jax.Array, low: jax.Array,
                         w1: jax.Array, b1: jax.Array,
                         w2: jax.Array, b2: jax.Array,
                         image_width: int | None = None,
                         relu2: bool = True, compute_dtype=jnp.bfloat16,
                         interpret: bool = False) -> jax.Array:
    """Fused decoder up-block (round 4): ``double_conv(concat(skip,
    up2_half_pixel(low)))`` with the upsampled tensor, the concat and the
    mid activation all VMEM-resident.

    The round-4 attribution priced the XLA decoder glue at ~17 GB of the
    b64 1080p core_t dispatch (skip concat 4.6 + 2.3 GB, H-lerp fusions
    4.6 + 2.3 GB, a layout copy on the pallas operand 3.4 GB). This kernel
    reads ``skip`` rows + HALF-resolution ``low`` rows and does the W
    -upsample as one MXU pass per low row ((cu, W/2) @ (W/2, W) against
    the constant two-tap half-pixel matrix — exactly ``ops/resize.
    _wmat_axis``), the H-lerp on the VPU (parity-static taps), and the
    conv pair as in :func:`double_conv_fused` with the contraction split
    across the skip and up buffers (no concat materialization anywhere).

    skip : [B, H, Cs, W]   (W lane-padded, zeros beyond ``image_width``)
    low  : [B, H/2, Cu, W/2]
    w1   : (3, 3, Cs+Cu, mid) Flax HWIO kernel — skip channels FIRST
           (the ``models/unet.py:252`` concat order); b1 (mid,)
    w2   : (3, 3, mid, cout); b2 (cout,)
    Half-pixel grid only (``upsample="half_pixel"``): its two-tap weights
    are position-invariant, so the in-kernel taps are parity-static;
    align_corners decoders keep the XLA path.
    returns [B, H, cout, W].
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np

    cdt = compute_dtype
    bsz, h, cs, wp = skip.shape
    _, h2, cu, wp2 = low.shape
    if h2 * 2 != h or wp2 * 2 != wp:
        raise ValueError(f"low must be exactly half of skip: {low.shape} "
                         f"vs {skip.shape}")
    wd = int(image_width) if image_width is not None else wp
    mid, cout = int(w1.shape[-1]), int(w2.shape[-1])
    if int(w1.shape[2]) != cs + cu:
        raise ValueError(f"w1 cin {w1.shape[2]} != Cs+Cu {cs + cu}")
    th = _tile_h(h)
    if th % 2 or h % th:
        raise ValueError(f"height {h} not tileable by even th")

    def prep(wk, nin, nout):
        wt = jnp.asarray(wk).transpose(1, 0, 2, 3)
        return wt.reshape(3, 3 * nin, nout).transpose(0, 2, 1).astype(cdt)

    w1s = prep(w1[:, :, :cs, :], cs, mid)
    w1u = prep(w1[:, :, cs:, :], cu, mid)
    w2g = prep(w2, mid, cout)
    b1c = jnp.asarray(b1).reshape(mid, 1).astype(cdt)
    b2c = jnp.asarray(b2).reshape(cout, 1).astype(cdt)

    # constant half-pixel W-up matrix, (W/2, W) column layout, zero outside
    # the true widths (ops/resize._linear_matrix_np — the same taps as the
    # NHWC _wmat_axis path)
    from ...ops.resize import _linear_matrix_np

    wlow = wd // 2
    m = _linear_matrix_np(wlow, wd, False)          # [wd, wlow]
    mp = np.zeros((wp2, wp), np.float32)
    mp[:wlow, :wd] = m.T
    mw = jnp.asarray(mp).astype(cdt)

    itemsize = jnp.dtype(cdt).itemsize
    vmem_need = ((th + 4) * (cs + 2 * cu) + (th // 2 + 4) * cu // 2 * 3
                 + (th + 2) * mid + th * cout + wp2) * wp * itemsize
    kwargs = {}
    if vmem_need > 12 * 1024 * 1024:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_up_kernel, th=th, height=h, width=wd, wp=wp,
                          wp2=wp2, cs=cs, cu=cu, mid=mid, cout=cout,
                          cdt=cdt, relu2=relu2),
        grid=(bsz, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # skip
            pl.BlockSpec(memory_space=pl.ANY),                  # low
            pl.BlockSpec((wp2, wp), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),              # mw
            pl.BlockSpec((3, mid, 3 * cs), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # w1s
            pl.BlockSpec((3, mid, 3 * cu), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # w1u
            pl.BlockSpec((mid, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),              # b1
            pl.BlockSpec((3, cout, 3 * mid), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),              # w2
            pl.BlockSpec((cout, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),              # b2
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((bsz, h, cout, wp), cdt),
        scratch_shapes=[
            pltpu.VMEM((th + 4, cs, wp), cdt),                  # xs
            pltpu.VMEM((th // 2 + 4, cu, wp2), cdt),            # xl
            pltpu.VMEM((th // 2 + 4, cu, wp), cdt),             # xlu
            pltpu.VMEM((th + 4, cu, wp), cdt),                  # xu
            pltpu.VMEM((th + 2, mid, wp), cdt),                 # z1m
            pltpu.VMEM((th, cout, wp), cdt),                    # ot
            pltpu.SemaphoreType.DMA((7,)),
        ],
        interpret=interpret,
        **kwargs,
    )(skip, low, mw, w1s, w1u, b1c, w2g, b2c)
    return out
