"""Batch sweep: transposed Pallas core (core_impl="auto") vs XLA NHWC.

The round-4 decision record (docs/PERF.md "Round-4 integration verdict"):
the transposed core wins at latency batches and loses at throughput
batches, because its row-tiled kernels pin the MXU M dim at the channel
width while XLA's conv GEMMs scale M with batch x pixels. This sweep
reproduces that curve end-to-end on the production engine config.

    python scripts/core_t_sweep.py [--batches 1,4,8,16,32,64,128]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
    jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--batches", default="1,4,8,16,32,64,128")
    p.add_argument("--seconds", type=float, default=6.0)
    args = p.parse_args(argv)

    cfg = ModelConfig(channels=1, space_to_depth=4, refine_width=64,
                      residual=True, upsample="half_pixel")
    rng = np.random.default_rng(0)

    def measure(engine, f1, f2):
        B = f1.shape[0]
        fn = engine._pair_fn(1, 1)

        def force(x):
            return np.asarray(x[0, 0, 0, 0, :])

        out = fn(engine.variables, f1, f2)
        force(out)
        for _ in range(2):
            force(fn(engine.variables, f1, f2))
        iters = 0
        t0 = time.perf_counter()
        while True:
            out = fn(engine.variables, f1, f2)
            iters += 1
            if iters % 4 == 0:
                force(out)
                if time.perf_counter() - t0 >= args.seconds:
                    break
        force(out)
        return B * iters / (time.perf_counter() - t0)

    for B in (int(b) for b in args.batches.split(",")):
        f1 = jnp.asarray(rng.integers(0, 255, (B, args.height, args.width,
                                               1), np.uint8))
        f2 = jnp.asarray(rng.integers(0, 255, f1.shape, np.uint8))
        base = None
        for core in ("xla", "auto"):
            jax.clear_caches()
            eng = InterpolationEngine.random_init(cfg)
            eng.core_impl = core
            try:
                mids = measure(eng, f1, f2)
            except Exception as e:
                print(f"b{B} {core}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)
                continue
            if base is None:
                base = mids
                print(f"b{B:<4d} {core:5s}: {mids:8.1f} mid/s", flush=True)
            else:
                print(f"b{B:<4d} {core:5s}: {mids:8.1f} mid/s  "
                      f"vs xla {mids / base * 100 - 100:+.1f}%", flush=True)
        del f1, f2
    return 0


if __name__ == "__main__":
    sys.exit(main())
