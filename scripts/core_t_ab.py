"""TPU A/B: transposed-layout Pallas U-Net core vs the XLA NHWC forward,
same-process, at the production engine config (CLAUDE.md findings 7/10).

Measures the FULL pair fn (normalize -> core -> fused refine -> uint8) so
every boundary relayout the integration claims to avoid is priced in —
the shuffle-eats-packing guard that caught core_pack (-13%), polyphase
(-38%) and the tower restructure (-50%).

Arms: core_impl="xla" baseline, then "auto" (the transposed core) at each
routing variant in --routes (comma-separated PALLAS_LEVELS sets, "+"
-joined; "all" = the default five). Reports mid/s, per-arm uint8 parity
vs baseline, and the marginal per-item cost between the two batches.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/core_t_ab.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    import numpy as np

    import jax

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)
    from ai_based_frame_interpolation_tpu.models import core_t

    from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
    jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--s2d", type=int, default=4)
    p.add_argument("--refine-width", type=int, default=64)
    p.add_argument("--upsample", default="half_pixel")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--seconds", type=float, default=6.0)
    p.add_argument("--routes", default="all,no_up3")
    args = p.parse_args(argv)

    cfg = ModelConfig(channels=args.channels, space_to_depth=args.s2d,
                      refine_width=args.refine_width, residual=True,
                      upsample=args.upsample)
    rng = np.random.default_rng(0)
    f1 = rng.integers(0, 255, (args.batch, args.height, args.width,
                               args.channels), np.uint8)
    f2 = rng.integers(0, 255, f1.shape, np.uint8)

    def measure(engine):
        import jax.numpy as jnp

        fn = engine._pair_fn(1, 1)
        j1, j2 = jnp.asarray(f1), jnp.asarray(f2)

        def force(x):
            return np.asarray(x[0, 0, 0, 0, :])

        out = fn(engine.variables, j1, j2)
        force(out)
        for _ in range(2):
            force(fn(engine.variables, j1, j2))
        iters = 0
        t0 = time.perf_counter()
        while True:
            out = fn(engine.variables, j1, j2)
            iters += 1
            if iters % 4 == 0:
                force(out)
                if time.perf_counter() - t0 >= args.seconds:
                    break
        force(out)
        dt = time.perf_counter() - t0
        return args.batch * iters / dt, np.asarray(out)

    routes = []
    for spec in args.routes.split(","):
        if spec == "all":
            routes.append(("all", frozenset(
                {"inc", "down1", "down2", "up3", "up4"})))
        elif spec == "no_up3":
            routes.append(("no_up3", frozenset(
                {"inc", "down1", "down2", "up4"})))
        else:
            routes.append((spec, frozenset(spec.split("+"))))

    results = {}
    base_out = None
    arms = [("xla", None)] + [(f"core_t[{n}]", s) for n, s in routes]
    for label, levels in arms:
        # module flags are read at trace time; stale lowerings must go
        # (ADVICE round 3 — the refine A/B lesson)
        jax.clear_caches()
        if levels is not None:
            core_t.PALLAS_LEVELS = levels
        engine = InterpolationEngine.random_init(cfg)
        engine.core_impl = "xla" if levels is None else "auto"
        if levels is not None:
            ok = engine._core_t_ok(
                np.zeros((1, args.height + (-args.height) % cfg.pad_multiple,
                          args.width, args.channels)))
            print(f"{label}: _core_t_ok={ok}", flush=True)
        try:
            mids, out = measure(engine)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        results[label] = mids
        if base_out is None:
            base_out = out
            print(f"{label:16s}: {mids:8.1f} mid/s "
                  f"({args.batch / mids * 1e3:.1f} ms/dispatch)", flush=True)
        else:
            d = np.abs(out.astype(np.int16) - base_out.astype(np.int16))
            print(f"{label:16s}: {mids:8.1f} mid/s "
                  f"({args.batch / mids * 1e3:.1f} ms/dispatch)  "
                  f"max|d|={d.max()} mean={d.mean():.4f}  "
                  f"vs xla {mids / results['xla'] * 100 - 100:+.1f}%",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
