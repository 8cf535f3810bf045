"""TPU A/B: fused Pallas double-conv (row-major transposed layout) vs
XLA's NHWC conv pair, at the production core's block shapes.

The question this answers (CLAUDE.md finding 11 / round-2 VERDICT task 1):
does a transposed-layout Pallas core block beat XLA's convolutions at the
s2d4 1080p core shapes, where the measured dispatch sits ~3x above the
padded HBM roofline? The kernel (``ops/pallas/dconv_fused.py``) reads the
input once and writes only the output — the mid activation never touches
HBM — and runs width-on-lanes so padding is 480->512 instead of NHWC's
channel padding.

Shapes: the four 8-row-tileable DoubleConv blocks of the s2d4 core at
1088x1920 (inc, down1's conv pair, up3, up4 — the levels that dominate
``docs/hlo_attribution.json``). Both routes are measured in ONE process
(CLAUDE.md finding 10) with the marginal-slope method (finding 7).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/dconv_probe.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_based_frame_interpolation_tpu.ops.pallas.dconv_fused import (  # noqa: E402
    double_conv_fused, double_conv_reference)

from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (name, h, hp, w, wp, cin, mid, cout) — s2d4 core blocks at 1088x1920
# (hp > h = odd-height level zero-row-padded to an 8-multiple)
SHAPES = [
    ("inc",   272, 272, 480, 512, 32, 64, 64),
    ("down1", 136, 136, 240, 256, 64, 128, 128),
    ("down2", 68, 72, 120, 128, 128, 256, 256),
    ("up3",   136, 136, 240, 256, 256, 128, 64),
    ("up4",   272, 272, 480, 512, 128, 64, 64),
]


def measure(fn, args, batchlike, seconds=4.0):
    def force(x):
        return np.asarray(jax.device_get(x[0, 0, 0, :1]))

    force(fn(*args))
    force(fn(*args))
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(*args)
        iters += 1
        if iters % 8 == 0:
            force(out)
            t_end = time.perf_counter()
            if t_end - t0 >= seconds:
                break
    return (t_end - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs=2, default=[8, 16])
    p.add_argument("--seconds", type=float, default=4.0)
    args = p.parse_args()
    print(f"device: {jax.devices()[0].platform}; batches {args.batches}")

    rng = np.random.default_rng(0)
    for name, h, hp, w, wp, cin, mid, cout in SHAPES:
        w1 = jnp.asarray(rng.normal(size=(3, 3, cin, mid)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(mid,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(3, 3, mid, cout)) * 0.1,
                         jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)

        @jax.jit
        def ref(v, w1=w1, b1=b1, w2=w2, b2=b2):
            return double_conv_reference(v, w1, b1, w2, b2)

        def fused(v, w1=w1, b1=b1, w2=w2, b2=b2, w=w, h=h):
            return double_conv_fused(v, w1, b1, w2, b2, image_width=w,
                                     image_height=h)

        per = {}
        for route in ("xla", "pallas"):
            ms = {}
            for b in args.batches:
                if route == "xla":
                    v = jnp.asarray(rng.normal(size=(b, h, w, cin)),
                                    jnp.bfloat16)
                    fn, fa = ref, (v,)
                else:
                    v = jnp.asarray(rng.normal(size=(b, hp, cin, wp)),
                                    jnp.bfloat16)
                    fn, fa = fused, (v,)
                try:
                    ms[b] = measure(fn, fa, b, args.seconds)
                    print(f"{name:6s} {route:6s} b={b:3d}: {ms[b]:8.3f} "
                          f"ms/dispatch", flush=True)
                except Exception as e:
                    print(f"{name:6s} {route:6s} b={b}: FAILED "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)
            if len(ms) == 2:
                bs = sorted(ms)
                slope = (ms[bs[1]] - ms[bs[0]]) / (bs[1] - bs[0])
                per[route] = slope
                print(f"{name:6s} {route:6s} marginal: {slope:.4f} ms/item",
                      flush=True)
        if len(per) == 2:
            io_mb = (h * w * cin + h * w * cout) * 2 / 1e6
            print(f"{name:6s} => pallas/xla speedup {per['xla']/per['pallas']:.2f}x "
                  f"(io floor ~{io_mb / 0.82:.3f} ms @820GB/s)", flush=True)


if __name__ == "__main__":
    main()
