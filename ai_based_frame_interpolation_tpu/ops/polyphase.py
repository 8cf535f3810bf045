"""Polyphase fusion of the half-pixel 2x upsample into the following conv.

The decoder's ``Up`` block computes ``conv3x3(concat([skip, up2(x)]))``
(capability of reference ``model/unet.py:35-55``). With the TPU-native
``upsample="half_pixel"`` grid (torch ``align_corners=False``), the 2x
upsample is *phase-periodic*: every even output row is ``0.25*x[i-1] +
0.75*x[i]`` and every odd row ``0.75*x[i] + 0.25*x[i+1]`` (edge-clamped) —
unlike ``align_corners=True``, whose per-output tap positions drift and
therefore force a gather or dense matrix. Composing the two linear ops
therefore collapses ``conv3x3 ∘ up2`` into ONE conv at LOW resolution with
4x the output channels (one per output phase), followed by a
depth-to-space shuffle:

    conv3x3(up2(x))[2i+p, 2j+q] = sum_{e,f} Weff[p,q][e,f] @ x[i+e, j+f]

with ``Weff[p,q] = sum_{dy,dx} W[dy,dx] * A[p,dy,e] * A[q,dx,f]`` and ``A``
the constant 2-tap phase matrices. This is exactly the transposed-conv
identity, exploited decoder-side:

- the full-resolution upsampled 2C-channel intermediate NEVER exists in
  HBM (at 1080p/s2d4 the up4 H-interleave chain alone moved ~10 GB per
  b128 dispatch, ``docs/hlo_attribution.json``);
- the fused conv's output width is ``4*C_out`` (256 for the production
  decoder's top level instead of 64), filling the MXU's 128-lane N dim
  that thin decoder convs otherwise waste (<=50% utilization);
- FLOPs are identical (the composition is exact).

Border exactness: the upsample edge-clamps its taps, and the conv
zero-pads at the full-resolution border. Running the phase conv VALID
over an edge-padded ``x`` reproduces the clamp exactly for every REAL
output position, but also charges the border outputs with the conv's
virtual neighbors (rows ``-1``/``2H``, cols ``-1``/``2W``) as if they were
edge-extended, where the true conv sees zeros. Those contributions live
only on the 4 border rows/cols and are subtracted with closed-form
1-row/1-col correction terms (double-subtracted corners added back), so
the fused op matches ``conv3x3_SAME(up2_half_pixel(x))`` bit-for-bit in
f32 (``tests/test_polyphase.py``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# A[p, 1+dy, 1+e]: weight of low-res tap x[i+e] in upsampled row 2i+p+dy.
# Derived from the half-pixel phase taps up[2k] = 0.25 x[k-1] + 0.75 x[k],
# up[2k+1] = 0.75 x[k] + 0.25 x[k+1]:
#   p=0: dy=-1 -> row 2(i-1)+1; dy=0 -> row 2i; dy=+1 -> row 2i+1
#   p=1: dy=-1 -> row 2i;       dy=0 -> row 2i+1; dy=+1 -> row 2(i+1)
_A = np.array(
    [[[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]],
     [[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]]],
    np.float32)

_DN = ("NHWC", "HWIO", "NHWC")


def polyphase_kernel(w: jax.Array) -> jax.Array:
    """Compose a (3,3,C,Co) conv kernel with the half-pixel 2x upsample.

    Returns (3,3,C,4*Co) with the output channel axis ordered (p, q, co) —
    exactly what :func:`_depth_to_space2` expects.
    """
    a = jnp.asarray(_A, w.dtype)
    weff = jnp.einsum("yxco,pye,qxf->efcpqo", w, a, a)
    e, f, c = weff.shape[:3]
    return weff.reshape(e, f, c, -1)


def _depth_to_space2(x: jax.Array) -> jax.Array:
    """[B,H,W,4C] -> [B,2H,2W,C], channel order (p, q, c)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * w, c)


def _up1d(x: jax.Array, axis: int) -> jax.Array:
    """Half-pixel 2x upsample of one axis (edge-clamped), f32."""
    x = x.astype(jnp.float32)

    def sl(a, b):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(a, b)
        return x[tuple(idx)]

    xm = jnp.concatenate([sl(0, 1), sl(0, -1)], axis)
    xp = jnp.concatenate([sl(1, None), sl(-1, None)], axis)
    e = 0.25 * xm + 0.75 * x
    o = 0.75 * x + 0.25 * xp
    st = jnp.stack([e, o], axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return st.reshape(shape)


def _edge_corr(v: jax.Array, w3: jax.Array) -> jax.Array:
    """One border-line correction: sum_d w3[1+d] applied to v shifted by d.

    v:  [B, N, C]  the virtual border line the phase conv saw (edge-ext'd)
    w3: [3, C, Co] the conv kernel's row (or column) facing that border
    returns [B, N, Co]
    """
    n = v.shape[1]
    ve = jnp.concatenate([v[:, :1], v, v[:, -1:]], axis=1)      # edge-extend
    out = None
    for d in range(3):
        t = jnp.einsum("bnc,co->bno", ve[:, d:d + n], w3[d])
        out = t if out is None else out + t
    return out


def up2_conv_half_pixel(x_low: jax.Array, x_skip: jax.Array,
                        kernel: jax.Array, bias: Optional[jax.Array] = None,
                        compute_dtype=jnp.bfloat16) -> jax.Array:
    """``conv3x3_SAME(concat([x_skip, up2_half_pixel(x_low)], -1))``, fused.

    x_low  : [B, H, W, Cl]   pre-upsample decoder activation
    x_skip : [B, 2H, 2W, Cs] encoder skip (concat'd FIRST, as in ``Up``)
    kernel : [3, 3, Cs+Cl, Co] the conv kernel (f32 params)
    returns [B, 2H, 2W, Co] in f32 (callers cast; BN runs f32 anyway)
    """
    cs = x_skip.shape[-1]
    w_skip = kernel[:, :, :cs]
    w_low = kernel[:, :, cs:]
    cdt = compute_dtype

    skip = lax.conv_general_dilated(
        x_skip.astype(cdt), w_skip.astype(cdt), (1, 1), "SAME",
        dimension_numbers=_DN, preferred_element_type=jnp.float32)

    weff = polyphase_kernel(w_low)
    xp = jnp.pad(x_low, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    ph = lax.conv_general_dilated(
        xp.astype(cdt), weff.astype(cdt), (1, 1), "VALID",
        dimension_numbers=_DN, preferred_element_type=jnp.float32)
    out = skip + _depth_to_space2(ph)

    # Border corrections (f32-exact): subtract the phase conv's virtual
    # edge-extended neighbors (true conv zero-pads there), add back the
    # double-subtracted corners.
    wl = w_low.astype(jnp.float32)
    xl = x_low.astype(jnp.float32)
    v_top = _up1d(xl[:, 0], axis=1)                 # [B, 2W, Cl]
    v_bot = _up1d(xl[:, -1], axis=1)
    v_lft = _up1d(xl[:, :, 0], axis=1)              # [B, 2H, Cl]
    v_rgt = _up1d(xl[:, :, -1], axis=1)
    out = out.at[:, 0].add(-_edge_corr(v_top, wl[0].transpose(0, 1, 2)))
    out = out.at[:, -1].add(-_edge_corr(v_bot, wl[2]))
    out = out.at[:, :, 0].add(-_edge_corr(v_lft, wl.transpose(1, 0, 2, 3)[0]))
    out = out.at[:, :, -1].add(-_edge_corr(v_rgt, wl.transpose(1, 0, 2, 3)[2]))
    corners = (
        ((0, 0), (0, 0)), ((0, -1), (0, 2)),
        ((-1, 0), (2, 0)), ((-1, -1), (2, 2)))
    for (ri, ci), (ky, kx) in corners:
        out = out.at[:, ri, ci].add(
            jnp.einsum("bc,co->bo", xl[:, ri, ci], wl[ky, kx]))

    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
