"""Decompose the production dispatch: core vs refine head vs pre/post.

The round-2 PERF numbers implied the fused refine head costs ~2.0 ms/mid
(~60% of the b128 dispatch), yet halving its roll cost measured neutral
(scripts/refine_fast_ab.py). This measures, in one session at the same
batch: (a) the full production pipeline, (b) the same graph with
``skip_refine`` (core + resize + pre/post, no head), (c) refine widths
32/64, (d) the depthwise head. Differences attribute the dispatch.

Usage: python scripts/refine_share.py [--batch 128 --seconds 8]
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
    p.add_argument("--s2d", type=int, default=4)
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
    from ai_based_frame_interpolation_tpu.ops.image import (
        denormalize_to_uint8, normalize_uint8)
    from ai_based_frame_interpolation_tpu.ops.resize import (
        crop_to, pad_to_multiple)

    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.integers(0, 255, (args.batch, args.height,
                                           args.width, 1), np.uint8))
    f2 = jnp.asarray(rng.integers(0, 255, f1.shape, np.uint8))

    def bench(fn, variables):
        def force(x):
            return np.asarray(x.reshape(-1)[:4])

        out = fn(variables, f1, f2)
        force(out)
        for _ in range(2):
            force(fn(variables, f1, f2))
        iters = 0
        t0 = time.perf_counter()
        while True:
            out = fn(variables, f1, f2)
            iters += 1
            if iters % 4 == 0:
                force(out)
                if time.perf_counter() - t0 >= args.seconds:
                    break
        force(out)
        dt = time.perf_counter() - t0
        return args.batch * iters / dt

    def full(engine):
        return bench(engine._pair_fn(1, 1), engine.variables), engine

    def skip(engine):
        cfg = engine.cfg

        @jax.jit
        def fn(variables, a, b):
            x1, hw = pad_to_multiple(normalize_uint8(a, engine.compute_dtype),
                                     cfg.pad_multiple)
            x2, _ = pad_to_multiple(normalize_uint8(b, engine.compute_dtype),
                                    cfg.pad_multiple)
            y = engine.model.apply(variables, x1, x2, train=False,
                                   skip_refine=True)
            return denormalize_to_uint8(crop_to(y.astype(
                engine.compute_dtype), hw))

        return bench(fn, engine.variables)

    rows = {}
    e64 = InterpolationEngine.random_init(
        ModelConfig(space_to_depth=args.s2d, refine_width=64))
    rows["full_r64"], _ = full(e64)
    print(f"full_r64:  {rows['full_r64']:.1f} mid/s", flush=True)
    rows["skip_refine"] = skip(e64)
    print(f"skip_refine: {rows['skip_refine']:.1f} mid/s", flush=True)
    e32 = InterpolationEngine.random_init(
        ModelConfig(space_to_depth=args.s2d, refine_width=32))
    rows["full_r32"], _ = full(e32)
    print(f"full_r32:  {rows['full_r32']:.1f} mid/s", flush=True)
    edw = InterpolationEngine.random_init(
        ModelConfig(space_to_depth=args.s2d, refine_width=64,
                    refine_depthwise=True))
    rows["full_r64dw"], _ = full(edw)
    print(f"full_r64dw: {rows['full_r64dw']:.1f} mid/s", flush=True)

    b = args.batch
    ms = {k: b / v * 1e3 for k, v in rows.items()}
    print("\nms/dispatch:", {k: round(v, 1) for k, v in ms.items()})
    print(f"head r64 cost: {ms['full_r64'] - ms['skip_refine']:.1f} ms "
          f"({(ms['full_r64'] - ms['skip_refine']) / ms['full_r64'] * 100:.0f}"
          f"% of dispatch)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
