"""Same-process A/B: fused Pallas flow sampler vs the XLA shifts route.

Cross-session benches suggested the fused kernel is ~4-10% slower than the
XLA chained-barrier warp at gray 1080p (343 vs 357 fps mf32, 483 vs 533
mf16) — but TPU session throughput varies run-to-run (CLAUDE.md finding
10), so the auto-routing decision needs both arms in ONE process. The
kernel exists for RGB 1080p, where the monolithic XLA warp graph kills the
remote compile helper; this script decides whether GRAY should keep
routing to it.

    python scripts/sampler_ab.py [max_flow]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine

from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 1080, 1920
BATCHES = (64, 128)


def measure(eng, batch, seconds=6.0):
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.integers(0, 255, (batch, H, W, 1), np.uint8))
    f2 = jnp.asarray(rng.integers(0, 255, f1.shape, np.uint8))
    fn = eng._pair_fn(1, 1)

    def force(x):
        return np.asarray(x[0, 0, 0, :])

    force(fn(eng.variables, f1, f2))
    force(fn(eng.variables, f1, f2))
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(eng.variables, f1, f2)
        iters += 1
        if iters % 4 == 0:
            force(out)
            if time.perf_counter() - t0 >= seconds:
                break
    force(out)
    dt = time.perf_counter() - t0
    return dt / iters * 1e3


def main():
    mf = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = ModelConfig(arch="flow", base_width=32, flow_scale=4,
                      refine_width=16, max_flow=mf)
    print(f"device: {jax.devices()[0].platform}; flow fs4+r16 mf{mf} "
          f"@{H}x{W} gray")
    marg = {}
    for impl in ("xla", "pallas"):
        eng = InterpolationEngine.random_init(cfg, seed=7)
        eng.sampler_impl = impl
        if impl == "xla":
            eng.refine_impl = "auto"   # head kernel stays on in both arms
        per = {}
        for b in BATCHES:
            try:
                per[b] = measure(eng, b)
                print(f"{impl:6s} b={b:3d}: {per[b]:8.2f} ms/dispatch "
                      f"({b / per[b] * 1e3:7.1f} mid/s)")
            except Exception as e:
                print(f"{impl:6s} b={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}")
        if len(per) == 2:
            bs = sorted(per)
            m = (per[bs[1]] - per[bs[0]]) / (bs[1] - bs[0])
            print(f"{impl:6s} marginal: {m:.3f} ms/item "
                  f"({1e3 / m:7.1f} mid/s marginal)")
            marg[impl] = m
        del eng
    if len(marg) == 2:
        print(f"summary: pallas = {marg['xla'] / marg['pallas']:.3f}x "
              f"the xla rate (marginal)")


if __name__ == "__main__":
    main()
