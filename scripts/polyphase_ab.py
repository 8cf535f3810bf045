"""Same-process A/B: half-pixel decoder upsample — lerp chain vs polyphase.

``ops/polyphase.py`` collapses ``conv3x3 ∘ up2_half_pixel`` into one
low-resolution 4-phase conv + depth-to-space: no full-res upsampled
intermediate in HBM and 4x the conv's MXU N width. This measures the
production engine config three ways in one process (TPU session throughput
varies run-to-run; same-process A/B is the house rule):

  1. upsample="align_corners" (the current production default)
  2. upsample="half_pixel", UP_POLYPHASE off (shift+interleave lerp chain)
  3. upsample="half_pixel", UP_POLYPHASE on  (fused polyphase conv)

plus the uint8 output delta between 2 and 3 (same weights; the fusion is
f32-exact, so only bf16 accumulation-order noise should appear).

Usage: python scripts/polyphase_ab.py [--batch 64 --seconds 8 ...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
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
    from ai_based_frame_interpolation_tpu.models import unet as UN

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

    arms = [("align_corners", "align_corners", False),
            ("half_pixel lerp", "half_pixel", False),
            ("half_pixel poly", "half_pixel", True)]
    results = {}
    outs = {}
    for name, ups, poly in arms:
        UN.UP_POLYPHASE = poly
        engine = InterpolationEngine.random_init(
            ModelConfig(channels=args.channels, space_to_depth=args.s2d,
                        refine_width=args.refine_width, upsample=ups))
        mids, out = measure(engine)
        results[name] = mids
        outs[name] = out
        print(f"{name:16s}: {mids:8.1f} mid/s "
              f"({args.batch / mids * 1e3:.1f} ms/dispatch)", flush=True)
    UN.UP_POLYPHASE = True
    d = np.abs(outs["half_pixel poly"].astype(np.int16)
               - outs["half_pixel lerp"].astype(np.int16))
    print(f"poly vs lerp uint8 delta: max {d.max()}  mean {d.mean():.4f}")
    print(f"poly vs lerp:  {results['half_pixel poly'] / results['half_pixel lerp'] * 100 - 100:+.1f}%")
    print(f"poly vs align: {results['half_pixel poly'] / results['align_corners'] * 100 - 100:+.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
