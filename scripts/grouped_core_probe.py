"""Probe: does batch-to-channel packing beat lane padding on the unet core?

Round-3 measurement (docs/PERF.md, CLAUDE.md finding 11) showed the s2d
core's HBM floor is LANE-PADDED: XLA stores <128-channel activations padded
to 128 lanes in HBM, so narrowing the model saves no bytes and the core
sits ~2.5x above its true byte floor. The untested lever: fold G batch
items into channels so C*G == 128 and run every conv as a grouped conv
(``feature_group_count=G``) with the SAME weights tiled per group — the
activation tensors then fill the lane dimension exactly and the padding
disappears *if* XLA lays grouped-conv operands out unpadded.

This probe measures a 3-conv chain at the production s2d4 geometry
(272x480 spatial, 16->64->64->16 channels, bf16) in both layouts, two batch
sizes each (marginal-slope discipline: tunnel dispatch overhead ~10 ms,
CLAUDE.md finding 7). Run on the real chip:

    python scripts/grouped_core_probe.py

Decision rule: packed marginal ms/item < 0.8x unpacked -> implement a
``core_pack`` model option; otherwise record the negative result.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


H, W = 272, 480          # 1080p after s2d=4 (1088/4 x 1920/4)
C_IN, C_MID = 16, 64     # s2d4 gray input channels; production base width


def conv(x, w, groups=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.float32
    ).astype(jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("groups",))
def chain(x, w1, w2, w3, groups=1):
    y = jax.nn.relu(conv(x, w1, groups))
    y = jax.nn.relu(conv(y, w2, groups))
    return conv(y, w3, groups)


def tile_w(w, g):
    # shared weights per group: HWIO with O repeated g times (grouped conv
    # splits I across groups and concatenates O blocks)
    return jnp.tile(w, (1, 1, 1, g))


def measure(fn, args, iters=12):
    out = fn(*args)
    np.asarray(out[0, 0, 0, :1])          # force (block_until_ready no-op)
    for _ in range(2):
        np.asarray(fn(*args)[0, 0, 0, :1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out[0, 0, 0, :1])
    return (time.perf_counter() - t0) / iters * 1e3


@functools.partial(jax.jit, static_argnames=("groups",))
def unet_ish(x, w1, w2, w3, groups=1):
    """Mini U-Net shape: conv -> 2x2-pool -> conv -> resize-up ->
    skip-concat -> conv. Exercises the packed layout's real obstacles:
    the spatial ops are group-agnostic but the skip concat must interleave
    channel blocks per group (a lane shuffle XLA has to schedule)."""
    g = groups
    s = jax.nn.relu(conv(x, w1, g))                     # (b,H,W,gm)
    d = jax.lax.reduce_window(s, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    d = jax.nn.relu(conv(d, w2, g))
    u = jax.image.resize(d, (d.shape[0], d.shape[1] * 2, d.shape[2] * 2,
                             d.shape[3]), "nearest")
    if g == 1:
        z = jnp.concatenate([u, s], axis=-1)
    else:
        b2, hh, ww, _ = u.shape
        cm = u.shape[-1] // g
        z = jnp.concatenate(
            [u.reshape(b2, hh, ww, g, cm), s.reshape(b2, hh, ww, g, cm)],
            axis=-1).reshape(b2, hh, ww, 2 * cm * g)
    return conv(z, w3, g)


def run_arm(rng, name, batches, g, weights, fn):
    per_item = {}
    for b in batches:
        if name.startswith("packed"):
            x = jnp.asarray(rng.standard_normal((b // g, H, W, C_IN * g)),
                            jnp.bfloat16)
            args = (x,) + tuple(tile_w(w, g) for w in weights)
            ms = measure(lambda *a: fn(*a, groups=g), args)
        else:
            x = jnp.asarray(rng.standard_normal((b, H, W, C_IN)),
                            jnp.bfloat16)
            ms = measure(fn, (x,) + tuple(weights))
        per_item[b] = ms
        print(f"{name:14s} b={b:3d}: {ms:7.2f} ms/iter "
              f"({ms / b:6.3f} ms/item)")
    bs = sorted(per_item)
    marg = (per_item[bs[1]] - per_item[bs[0]]) / (bs[1] - bs[0])
    print(f"{name:14s} marginal: {marg:.3f} ms/item")
    return marg


def main():
    rng = np.random.default_rng(0)
    k = lambda ci, co: jnp.asarray(
        rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
    g = 128 // C_IN                       # 8: pack to a full lane dim
    print(f"device: {jax.devices()[0].platform}, pack factor g={g}")

    w1, w2, w3 = k(C_IN, C_MID), k(C_MID, C_MID), k(C_MID, C_IN)
    m = {}
    m["unpacked"] = run_arm(rng, "unpacked", (8, 16), g, (w1, w2, w3),
                            chain)
    m["packed"] = run_arm(rng, "packed", (8, 16), g, (w1, w2, w3), chain)
    print(f"conv-chain packed speedup: "
          f"{m['unpacked'] / m['packed']:.2f}x")

    # experiment 2: U-Net-shaped chain with pool/resize/skip-concat
    wu1, wu2 = k(C_IN, C_MID), k(C_MID, C_MID)
    wu3 = k(2 * C_MID, C_IN)              # skip concat doubles channels
    m["unpacked-unet"] = run_arm(rng, "unpacked-unet", (8, 16), g,
                                 (wu1, wu2, wu3), unet_ish)
    m["packed-unet"] = run_arm(rng, "packed-unet", (8, 16), g,
                               (wu1, wu2, wu3), unet_ish)
    print(f"unet-shape packed speedup: "
          f"{m['unpacked-unet'] / m['packed-unet']:.2f}x")


if __name__ == "__main__":
    main()
