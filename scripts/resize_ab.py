"""Same-process A/B: H-axis integer-upsample taps — shifts vs jnp.take.

docs/hlo_attribution.json (round 3) showed the production 1080p b128
dispatch spends 28 GB of padded traffic in 24 SERIALIZED while-loop gathers
that XLA generates for the decoder's H-axis ``jnp.take`` resizes. The
shift+select formulation (ops/resize.py ``_lerp_axis``) computes the same
two-tap lerp bit-for-bit from a repeat + two shifted copies + constant-mask
selects — no descriptors. This script measures both in one process (TPU
session throughput varies run-to-run; same-process A/B is the house rule).

Usage: python scripts/resize_ab.py [--batch 128 --seconds 8 ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(engine, batch, h, w, c, seconds, factor=2):
    import math

    import numpy as np
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.integers(0, 255, (batch, h, w, c), np.uint8))
    f2 = jnp.asarray(rng.integers(0, 255, f1.shape, np.uint8))
    depth = int(math.log2(factor))
    fn = engine._pair_fn(factor - 1, depth)

    def force(x):
        return np.asarray(x[0, 0, 0, :])

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
            if time.perf_counter() - t0 >= seconds:
                break
    force(out)
    dt = time.perf_counter() - t0
    mids = batch * (factor - 1) * iters / dt
    return mids


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--s2d", type=int, default=4)
    p.add_argument("--refine-width", type=int, default=64)
    p.add_argument("--seconds", type=float, default=8.0)
    args = p.parse_args(argv)

    import jax

    from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
    jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)
    from ai_based_frame_interpolation_tpu.ops import resize as R

    print("platform:", jax.devices()[0].platform, flush=True)
    results = {}
    for impl in ("take", "shifts"):        # control first (round-2 code)
        R._INT_UPSAMPLE_IMPL = impl
        engine = InterpolationEngine.random_init(
            ModelConfig(channels=args.channels, space_to_depth=args.s2d,
                        refine_width=args.refine_width))
        mids = measure(engine, args.batch, args.height, args.width,
                       args.channels, args.seconds)
        results[impl] = mids
        print(f"{impl:7s}: {mids:8.1f} mid/s "
              f"({args.batch / mids * 1e3 * (1):.1f} ms/dispatch "
              f"b{args.batch})", flush=True)
    rel = results["shifts"] / results["take"] - 1.0
    print(f"shifts vs take: {rel * 100:+.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
