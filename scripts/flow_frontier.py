"""Flow-family 1080p frontier: RGB production batch + the quality flagship.

Round-2 VERDICT tasks 2 & 4: (a) RGB flow had no credible 1080p number —
the fused sampler 500s the tunnel compile helper and the monolithic split
route fails at b16+; (b) the crowned quality flagship (fs1+photo) had NO
1080p fps at all (fs1 doesn't compile monolithically). Both engines'
mechanisms compose: the split-jit flow path (motion program + sampler
program) is wrapped by the ``max_dispatch_batch`` microbatcher, so a large
caller batch runs as N compiled-once chunks of a size the compile helper
accepts. This script measures the combinations in ONE process (TPU session
throughput varies; same-session numbers only) and writes JSON.

Usage: python scripts/flow_frontier.py [--seconds 8 --out docs/flow_frontier.json]
"""

import argparse
import json
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
        return np.asarray(x[0, 0, 0, 0, :])   # [B, n_out, H, W, C]

    out = fn(engine.variables, f1, f2)
    force(out)
    for _ in range(2):
        force(fn(engine.variables, f1, f2))
    iters = 0
    t0 = time.perf_counter()
    while True:
        out = fn(engine.variables, f1, f2)
        iters += 1
        force(out)              # host trampoline: force every iteration
        if time.perf_counter() - t0 >= seconds:
            break
    dt = time.perf_counter() - t0
    return batch * (factor - 1) * iters / dt


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--seconds", type=float, default=8.0)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--out", default="docs/flow_frontier.json")
    p.add_argument("--arms", nargs="+", default=None,
                   help="subset of arm names to run")
    args = p.parse_args(argv)

    import jax

    from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
    jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    print("platform:", jax.devices()[0].platform, flush=True)

    # (name, cfg kwargs, channels, split override, mdb, caller batches)
    ARMS = [
        # RGB production point: split + microbatch8 (b8 is the largest
        # chunk the helper accepts; larger caller batches amortize the
        # trampoline + measure "production batch" honestly)
        ("rgb_fs4_r16_mdb8",
         dict(arch="flow", channels=3, base_width=32, flow_scale=4,
              refine_width=16), 3, True, 8, [64, 32, 16, 8]),
        # can a 16-chunk compile via split now? (round-2 said no; re-check)
        ("rgb_fs4_r16_mdb16",
         dict(arch="flow", channels=3, base_width=32, flow_scale=4,
              refine_width=16), 3, True, 16, [64, 32, 16]),
        # quality flagship: gray fs1+r16 (the photo recipe shares this
        # architecture; weights don't change throughput)
        ("gray_fs1_r16_split_mdb8",
         dict(arch="flow", channels=1, base_width=32, flow_scale=1,
              refine_width=16), 1, True, 8, [64, 32, 16, 8]),
        ("gray_fs1_r16_split_mdb16",
         dict(arch="flow", channels=1, base_width=32, flow_scale=1,
              refine_width=16), 1, True, 16, [64, 32, 16]),
        ("gray_fs1_r16_split_mdb32",
         dict(arch="flow", channels=1, base_width=32, flow_scale=1,
              refine_width=16), 1, True, 32, [64, 32]),
        # speed point re-measure in THIS session for cross-validation
        ("gray_fs4_r16_mf16_b128",
         dict(arch="flow", channels=1, base_width=32, flow_scale=4,
              refine_width=16, max_flow=16), 1, None, None, [128]),
        ("gray_fs4_r16_mf32_b96",
         dict(arch="flow", channels=1, base_width=32, flow_scale=4,
              refine_width=16, max_flow=32), 1, None, None, [96]),
    ]

    results = {}
    for name, kw, c, split, mdb, batches in ARMS:
        if args.arms and name not in args.arms:
            continue
        row = {"config": kw, "split": split, "max_dispatch_batch": mdb,
               "batches": {}}
        try:
            engine = InterpolationEngine.random_init(ModelConfig(**kw))
            if split is not None:
                engine.flow_split_override = split
            if mdb:
                engine.max_dispatch_batch = mdb
            for b in batches:
                try:
                    t0 = time.perf_counter()
                    mids = measure(engine, b, args.height, args.width, c,
                                   args.seconds)
                    row["batches"][b] = {
                        "mid_per_s": round(mids, 2),
                        "output_fps_2x": round(2 * mids, 2),
                        "first_call_s": round(time.perf_counter() - t0, 1)}
                    print(f"{name} b{b}: {mids:.1f} mid/s "
                          f"({2*mids:.1f} out fps)", flush=True)
                    break      # largest working batch is the headline
                except Exception as e:
                    row["batches"][b] = {"error":
                                         f"{type(e).__name__}: {str(e)[:200]}"}
                    print(f"{name} b{b}: FAILED {type(e).__name__}: "
                          f"{str(e)[:120]}", flush=True)
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"{name}: engine FAILED {e}", flush=True)
        results[name] = row
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("wrote", args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
