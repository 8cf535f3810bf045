"""Same-process A/B of the refine head's direct NHWC mode.

The legacy fused-head call site builds a plane-major padded transposed
stack (concat + two pads + NHWC->NCHW transposes + a dedicated f32
residual copy) before the pallas_call — ~12 GB of HBM traffic per
production b128 1080p dispatch (docs/hlo_attribution.json). Direct mode
DMAs the model's NHWC outputs straight into the kernel (8-aligned
row-window copies, circular column taps with wrap masks) and reads the
residual from the prediction plane's f32 scratch window. This measures
production-config engine throughput with ``refine_fused._DIRECT`` off/on;
the paths are bit-identical on TPU (scripts/refine_direct_probe.py).

Usage: python scripts/refine_direct_ab.py [--batch 128 --seconds 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    import numpy as np

    import jax
    import jax.numpy as jnp

    from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
    jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)
    from ai_based_frame_interpolation_tpu.ops.pallas import refine_fused as RF

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.integers(0, 255, (args.batch, args.height,
                                           args.width, args.channels),
                                  np.uint8))
    f2 = jnp.asarray(rng.integers(0, 255, f1.shape, np.uint8))

    def measure(engine):
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
        dt = time.perf_counter() - t0
        return args.batch * iters / dt, np.asarray(out)

    results = {}
    outs = {}
    for direct in (False, True):
        RF._DIRECT = direct
        # the flag is read at trace time: without this, the second arm can
        # silently reuse the first arm's jit lowering (ADVICE round 3)
        jax.clear_caches()
        engine = InterpolationEngine.random_init(
            ModelConfig(channels=args.channels, space_to_depth=args.s2d,
                        refine_width=args.refine_width))
        mids, out = measure(engine)
        results[direct] = mids
        outs[direct] = out
        print(f"direct={direct}: {mids:8.1f} mid/s "
              f"({args.batch / mids * 1e3:.1f} ms/dispatch)", flush=True)
    d = np.abs(outs[True].astype(np.int16) - outs[False].astype(np.int16))
    print(f"max |uint8 delta| = {d.max()}  (mean {d.mean():.4f})")
    print(f"direct vs legacy: "
          f"{results[True] / results[False] * 100 - 100:+.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
