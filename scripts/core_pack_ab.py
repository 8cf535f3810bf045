"""A/B: batch-to-channel packed core (core_pack) vs the production layout.

Follow-up to scripts/grouped_core_probe.py (packed U-Net-shaped chain
measured a 3.13x marginal-speedup at the s2d4 geometry): measures the REAL
production engine (s2d4 + refine64, folded, fused refine head) at pack
factors 1/2/4/8 in ONE process (TPU session throughput varies run-to-run —
CLAUDE.md finding 10), two batch sizes each for the marginal slope
(finding 7: ~10 ms fixed dispatch overhead on the tunnel).

Also checks numeric parity packed-vs-unpacked on-device first (uint8 LSB).

    python scripts/core_pack_ab.py            # on the TPU
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine

from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CFG = ModelConfig(space_to_depth=4, residual=True, refine_width=64)
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
    return dt / iters * 1e3          # ms per dispatch


def main():
    print(f"device: {jax.devices()[0].platform}; config s2d4+res+refine64 "
          f"@{H}x{W}")

    # numeric parity gate (small shape, cheap compile)
    rng = np.random.default_rng(5)
    s1 = rng.integers(0, 255, (8, 128, 256, 1), dtype=np.uint8)
    s2 = rng.integers(0, 255, s1.shape, dtype=np.uint8)
    ref = InterpolationEngine.random_init(CFG, seed=7).interpolate_batch(
        s1, s2)
    for g in (2, 4, 8):
        out = InterpolationEngine.random_init(
            CFG, seed=7, core_pack=g).interpolate_batch(s1, s2)
        d = int(np.max(np.abs(out.astype(int) - ref.astype(int))))
        print(f"pack g={g}: max LSB diff vs unpacked = {d}")
        assert d <= 2, d

    results = {}
    for g in (1, 2, 4, 8):
        eng = InterpolationEngine.random_init(CFG, seed=7, core_pack=g)
        per = {}
        for b in BATCHES:
            try:
                per[b] = measure(eng, b)
                print(f"g={g} b={b:3d}: {per[b]:8.2f} ms/dispatch "
                      f"({per[b] / b:6.3f} ms/item, "
                      f"{b / per[b] * 1e3:7.1f} mid/s)")
            except Exception as e:
                print(f"g={g} b={b}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
        if len(per) == 2:
            bs = sorted(per)
            marg = (per[bs[1]] - per[bs[0]]) / (bs[1] - bs[0])
            print(f"g={g} marginal: {marg:.3f} ms/item "
                  f"({1e3 / marg:7.1f} mid/s marginal)")
            results[g] = marg
        del eng
    if 1 in results:
        for g, m in sorted(results.items()):
            print(f"summary g={g}: {results[1] / m:5.2f}x vs unpacked")


if __name__ == "__main__":
    main()
