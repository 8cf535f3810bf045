"""Same-process A/B of the refine-kernel compiled-mode micro-opts.

Round-2 left the fused head VPU/issue-bound (~2.0 ms/mid at 1080p w64 —
~60% of the whole production dispatch) with one suggestion untried: bf16
operands for the MXU stages. Round 3 adds two lowering changes behind
``ops/pallas/refine_fused._FAST``:

- lane rolls of bf16 data go through a ``pltpu.bitcast`` f32 view (half the
  rotate-unit rows, no convert round trip);
- the 1x1 out-conv runs on the MXU with bf16 operands instead of the VPU
  sublane reduction.

This measures production-config throughput with the switch off (round-2
lowering) and on, plus the max output delta on identical inputs.

Usage: python scripts/refine_fast_ab.py [--batch 128 --seconds 8]
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
    for fast in (False, True):
        RF._FAST = fast
        # the flag is read at trace time: without this, the second arm can
        # silently reuse the first arm's jit lowering (ADVICE round 3)
        jax.clear_caches()
        engine = InterpolationEngine.random_init(
            ModelConfig(channels=args.channels, space_to_depth=args.s2d,
                        refine_width=args.refine_width))
        mids, out = measure(engine)
        results[fast] = mids
        outs[fast] = out
        print(f"fast={fast}: {mids:8.1f} mid/s "
              f"({args.batch / mids * 1e3:.1f} ms/dispatch)", flush=True)
    # the two engines share the PRNG seed -> identical weights; uint8 output
    # delta isolates the lowering change
    d = np.abs(outs[True].astype(np.int16) - outs[False].astype(np.int16))
    print(f"max |uint8 delta| = {d.max()}  (mean {d.mean():.4f})")
    print(f"fast vs slow: {results[True] / results[False] * 100 - 100:+.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
