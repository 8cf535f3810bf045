"""TPU compile+parity probe for the refine head's direct NHWC mode.

Per the repo gotcha (CLAUDE.md): every Pallas kernel must be
TPU-compile-checked at batch>1 before evals/benches rely on it — interpret
mode does not enforce Mosaic's tiling/alignment rules. This compiles the
direct path at the queue's eval shape (128x128 gray, flow 5-plane and unet
3-plane heads) and at a production-like 1080p shape, and checks parity with
the XLA composition.

Run:  nohup python scripts/refine_direct_probe.py > /tmp/refine_direct_probe.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import ai_based_frame_interpolation_tpu.ops.pallas.refine_fused as _rf
_rf._DIRECT = True
from ai_based_frame_interpolation_tpu.ops.pallas.refine_fused import (
    refine_head_fused)


def xla_ref(y, planes, p1, p2, p3):
    z = jnp.concatenate([y.astype(jnp.bfloat16)]
                        + [p.astype(jnp.bfloat16) for p in planes], axis=-1)
    dn = ("NHWC", "HWIO", "NHWC")
    z1 = jax.nn.relu(jax.lax.conv_general_dilated(
        z, p1["kernel"].astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        + p1["bias"].astype(jnp.bfloat16))
    z2 = jax.nn.relu(jax.lax.conv_general_dilated(
        z1, p2["kernel"].astype(jnp.bfloat16), (1, 1), "SAME",
        dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        + p2["bias"].astype(jnp.bfloat16))
    d = jax.lax.conv_general_dilated(
        z2.astype(jnp.float32), p3["kernel"].astype(jnp.float32), (1, 1),
        "SAME", dimension_numbers=dn, preferred_element_type=jnp.float32)
    return (y + d + p3["bias"].astype(jnp.float32)).astype(jnp.bfloat16)


def case(name, b, h, wd, nplanes, w, ch=1):
    rng = np.random.default_rng(0)
    cin = nplanes * ch
    y = jnp.asarray(rng.uniform(-1, 1, (b, h, wd, ch)), jnp.float32)
    planes = tuple(jnp.asarray(rng.uniform(-1, 1, (b, h, wd, ch)),
                               jnp.float32) for _ in range(nplanes - 1))
    p1 = {"kernel": jnp.asarray(
        rng.normal(size=(3, 3, cin, w)) * 0.2, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(w,)) * 0.01, jnp.float32)}
    p2 = {"kernel": jnp.asarray(
        rng.normal(size=(3, 3, w, w)) * 0.2, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(w,)) * 0.01, jnp.float32)}
    p3 = {"kernel": jnp.asarray(
        rng.normal(size=(1, 1, w, ch)) * 0.2, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(ch,)) * 0.01, jnp.float32)}

    t0 = time.time()
    got = refine_head_fused(y, planes, p1, p2, p3)
    gotn = np.asarray(got, np.float32)
    t1 = time.time()
    ref = jax.jit(xla_ref)(y, planes, p1, p2, p3)
    refn = np.asarray(ref, np.float32)
    close = float(np.mean(np.abs(gotn - refn) <= 1.5e-2))
    exact = float(np.mean(gotn == refn))
    print(f"{name}: compiled+ran in {t1 - t0:.1f}s  "
          f"close={close:.5f} exact={exact:.4f} "
          f"maxdiff={float(np.max(np.abs(gotn - refn))):.4g}", flush=True)
    assert close > 0.999, (name, close)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    case("evalshape-flow5-w16 b2 128x128", 2, 128, 128, 5, 16)
    case("evalshape-unet3-w64 b2 128x128", 2, 128, 128, 3, 64)
    case("1080p-unet3-w64 b2", 2, 1088, 1920, 3, 64)
    case("rgb-128x128-unet3-w64 b2", 2, 128, 128, 3, 64, ch=3)
    case("rgb-1080p-unet3-w64 b2", 2, 1088, 1920, 3, 64, ch=3)
    print("ALL OK", flush=True)
