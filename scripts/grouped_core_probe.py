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


def main():
    rng = np.random.default_rng(0)
    k = lambda ci, co: jnp.asarray(
        rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.bfloat16)
    w1, w2, w3 = k(C_IN, C_MID), k(C_MID, C_MID), k(C_MID, C_IN)
    g = 128 // C_IN                       # 8: pack to a full lane dim
    print(f"device: {jax.devices()[0].platform}, pack factor g={g}")

    results = {}
    for name, batches in (("unpacked", (8, 16)), ("packed", (8, 16))):
        per_item = {}
        for b in batches:
            if name == "unpacked":
                x = jnp.asarray(rng.standard_normal((b, H, W, C_IN)),
                                jnp.bfloat16)
                ms = measure(lambda a: chain(a, w1, w2, w3), (x,))
            else:
                x = jnp.asarray(rng.standard_normal((b // g, H, W,
                                                     C_IN * g)), jnp.bfloat16)
                tw1, tw2, tw3 = tile_w(w1, g), tile_w(w2, g), tile_w(w3, g)
                ms = measure(
                    lambda a: chain(a, tw1, tw2, tw3, groups=g), (x,))
            per_item[b] = ms
            print(f"{name:9s} b={b:3d}: {ms:7.2f} ms/iter "
                  f"({ms / b:6.3f} ms/item)")
        bs = sorted(per_item)
        marg = (per_item[bs[1]] - per_item[bs[0]]) / (bs[1] - bs[0])
        results[name] = marg
        print(f"{name:9s} marginal: {marg:.3f} ms/item")
    speedup = results["unpacked"] / results["packed"]
    print(f"packed speedup (marginal): {speedup:.2f}x")


if __name__ == "__main__":
    main()
