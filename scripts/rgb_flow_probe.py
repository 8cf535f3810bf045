"""TPU validation of the channels-generic fused flow sampler at RGB 1080p.

The monolithic XLA shifts-warp graph deterministically 500s the remote
compile helper for RGB flow at b16+ (docs/STATUS.md); the split-jit path
compiles but left b16/b32 failing and b8 slow in one (possibly degraded)
session. The fused Pallas sampler (ops/pallas/warp_fused.py, per-channel
DMA, shift weights shared across channels) was made channels-generic to
unblock this. This probe measures RGB flow fs4+r16 at b8/b16/b32 with
sampler_impl forced to "pallas" and, for contrast, the engine's auto
route, in ONE process (CLAUDE.md finding 10: session throughput varies).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/rgb_flow_probe.py
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine

from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_args = argparse.ArgumentParser()
_args.add_argument("--height", type=int, default=1080)
_args.add_argument("--width", type=int, default=1920)
_args.add_argument("--batches", type=int, nargs="+", default=[8, 16, 32])
_ns = _args.parse_args()
H, W = _ns.height, _ns.width
BATCHES = tuple(_ns.batches)


def measure(eng, batch, seconds=6.0):
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.integers(0, 255, (batch, H, W, 3), np.uint8))
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
            # the force IS the sync point: take t_end here rather than
            # re-forcing after the loop (that extra ~31 ms D2H round trip
            # inflated short windows; ADVICE r2). Headline numbers should
            # still come from the marginal-slope line printed in main().
            force(out)
            t_end = time.perf_counter()
            if t_end - t0 >= seconds:
                break
    return (t_end - t0) / iters * 1e3


def main():
    cfg = ModelConfig(arch="flow", channels=3, base_width=32, flow_scale=4,
                      refine_width=16)
    print(f"device: {jax.devices()[0].platform}; RGB flow fs4+r16 @{H}x{W}")
    # (impl, max_dispatch_batch): the mb8 arms compile ONE b8 program and
    # loop it — the production-batch route around the compile-helper wall
    # (VERDICT r2 task 2: split-jit + microbatch combined).
    for impl, mb in (("pallas", None), ("auto", None), ("auto", 8),
                     ("pallas", 8)):
        eng = InterpolationEngine.random_init(cfg, seed=7)
        eng.sampler_impl = impl
        eng.max_dispatch_batch = mb
        impl = impl + (f"+mb{mb}" if mb else "")
        per = {}
        for b in BATCHES:
            try:
                per[b] = measure(eng, b)
                print(f"{impl:6s} b={b:3d}: {per[b]:8.2f} ms/dispatch "
                      f"({b / per[b] * 1e3:7.1f} mid/s)", flush=True)
            except Exception as e:
                print(f"{impl:6s} b={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        bs = sorted(k for k in per)
        if len(bs) >= 2:
            m = (per[bs[-1]] - per[bs[-2]]) / (bs[-1] - bs[-2])
            print(f"{impl:6s} marginal (b{bs[-2]}->b{bs[-1]}): "
                  f"{m:.3f} ms/item ({1e3 / m:7.1f} mid/s)")
        del eng


if __name__ == "__main__":
    main()
