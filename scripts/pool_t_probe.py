"""TPU microprobe: 2x2 max-pool implementations on the transposed layout.

The round-4 attribution showed `[B,H,C,W]` stride-2 LANE slicing lowering
to four pad-2 gather fusions (11.4 GB of the b64 core_t dispatch). This
measures the three candidate pool lowerings at the two transposed pool
shapes of the s2d4 1080p core, marginal-slope method.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pool_t_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ai_based_frame_interpolation_tpu.models import core_t

from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPES = [("pool1", 272, 64, 512), ("pool2", 136, 128, 256)]


def measure(fn, x, seconds=3.0):
    def force(v):
        return np.asarray(jax.device_get(v[0, 0, 0, :1]))

    force(fn(x))
    force(fn(x))
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(x)
        iters += 1
        if iters % 8 == 0:
            force(out)
            t_end = time.perf_counter()
            if t_end - t0 >= seconds:
                break
    return (t_end - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0], flush=True)
    for name, h, c, wp in SHAPES:
        ref = None
        xp = jnp.asarray(rng.normal(size=(2, h, c, wp)), jnp.bfloat16)
        for impl in ("slice", "matmul", "reduce_window"):
            core_t.POOL_IMPL = impl
            jax.clear_caches()
            fn = jax.jit(core_t._pool2_t)
            per = {}
            for b in (8, 16):
                x = jnp.asarray(rng.normal(size=(b, h, c, wp)),
                                jnp.bfloat16)
                x = jax.nn.relu(x)
                try:
                    per[b] = measure(fn, x)
                except Exception as e:
                    print(f"{name} {impl} b={b}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            if len(per) == 2:
                slope = (per[16] - per[8]) / 8
                out = np.asarray(fn(xp))
                if ref is None:
                    ref = out
                ok = np.array_equal(out, ref)
                print(f"{name} {impl:14s}: {slope:7.4f} ms/item "
                      f"(b8 {per[8]:.2f} b16 {per[16]:.2f}) parity={ok}",
                      flush=True)


if __name__ == "__main__":
    main()
