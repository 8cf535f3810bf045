"""Driver config 3 self-report: end-to-end video interpolation, per stage.

BASELINE driver config 3 is "2x video interpolation on a 10 s 720p clip
(decode -> pair batching -> encode)". On this host it measures far below
the device rate, and round-2 VERDICT (weak-4 / task 5) asked for a
committed artifact that makes the "codec/tunnel-bound" explanation
checkable. This script measures each stage in isolation and then the real
overlapped pipeline, and emits ONE JSON object:

- ``decode_fps``: AsyncVideoReader draining the clip, no compute;
- ``encode_fps``: AsyncVideoWriter writing pre-made frames, no compute;
- ``device_mid_per_s``: batched pair dispatches on the same frames,
  device-resident, forced with a tiny D2H slice (codec-free);
- ``d2h_mb_per_s`` / ``h2d_mb_per_s``: raw transfer rate of one batch of
  midpoints over the device link (the tunnel here; PCIe/DMA on a real host);
- ``e2e_output_fps``: ``engine.interpolate_video_file`` — the number the
  driver sees;
- ``overlap_efficiency``: e2e wall time vs the slowest single stage (1.0 =
  perfect overlap of decode/compute/D2H/encode);
- ``bound``: which stage the e2e rate tracks.

Usage:  python scripts/video_bench.py [--height 720 --width 1280
        --seconds 10 --fps 30 --batch-pairs 8 --out docs/video_bench.json]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--fps", type=float, default=30.0)
    p.add_argument("--channels", type=int, default=1)
    p.add_argument("--factor", type=int, default=2)
    p.add_argument("--batch-pairs", type=int, default=8)
    p.add_argument("--s2d", type=int, default=4)
    p.add_argument("--refine-width", type=int, default=64)
    p.add_argument("--out", default="docs/video_bench.json")
    args = p.parse_args(argv)

    import numpy as np

    import jax

    from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
    jax.config.update("jax_compilation_cache_dir", host_keyed("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.data.synthetic import (
        moving_scene_frames)
    from ai_based_frame_interpolation_tpu.data.video import (
        AsyncVideoReader, AsyncVideoWriter)
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    n_frames = int(args.seconds * args.fps)
    report = {"config": vars(args), "n_input_frames": n_frames,
              "platform": jax.devices()[0].platform}

    # --- build the clip (not timed) -------------------------------------
    frames = moving_scene_frames(num_frames=n_frames, height=args.height,
                                 width=args.width,
                                 channels=args.channels, seed=0)
    frames = [np.asarray(f, np.uint8) for f in frames]
    tmp = tempfile.mkdtemp(prefix="video_bench_")
    in_path = os.path.join(tmp, "in.mp4")
    out_path = os.path.join(tmp, "out.mp4")
    with AsyncVideoWriter(in_path, fps=args.fps) as w:
        for f in frames:
            w.write(f)

    # --- stage: decode only ---------------------------------------------
    t0 = time.perf_counter()
    reader = AsyncVideoReader(in_path, grayscale=args.channels == 1)
    n_dec = sum(1 for _ in reader)
    report["decode_fps"] = round(n_dec / (time.perf_counter() - t0), 1)
    report["decoded_frames"] = n_dec

    # --- stage: encode only (the OUTPUT frame count: factor x input) ----
    n_out_frames = n_dec * args.factor - (args.factor - 1)
    enc_frames = (frames * args.factor)[:n_out_frames]
    t0 = time.perf_counter()
    with AsyncVideoWriter(os.path.join(tmp, "enc.mp4"), fps=args.fps) as w:
        for f in enc_frames:
            w.write(f)
    report["encode_fps"] = round(len(enc_frames)
                                 / (time.perf_counter() - t0), 1)

    # --- engine + compile (not timed) ------------------------------------
    engine = InterpolationEngine.random_init(
        ModelConfig(channels=args.channels, space_to_depth=args.s2d,
                    refine_width=args.refine_width))
    import math

    depth = int(math.log2(args.factor))
    fn = engine._pair_fn(args.factor - 1, depth)
    b = args.batch_pairs
    f0 = np.stack(frames[:b])
    f1 = np.stack(frames[1:b + 1])

    def force(x):
        return np.asarray(x[0, 0, 0, :])

    d0, d1 = engine._put(f0), engine._put(f1)
    out = fn(engine.variables, d0, d1)
    force(out)

    # --- stage: device compute (device-resident, tiny force) ------------
    iters = max(2, (n_dec - 1) // b)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(engine.variables, d0, d1)
    force(out)
    dt = time.perf_counter() - t0
    mids_per_dispatch = b * (args.factor - 1)
    report["device_mid_per_s"] = round(iters * mids_per_dispatch / dt, 1)
    report["device_ms_per_dispatch"] = round(dt / iters * 1e3, 2)

    # --- stage: transfers -------------------------------------------------
    host_mids = None
    t0 = time.perf_counter()
    host_mids = np.asarray(out)              # full midpoint batch D2H
    dt = time.perf_counter() - t0
    report["d2h_mb_per_s"] = round(host_mids.nbytes / dt / 1e6, 1)
    report["d2h_bytes_per_dispatch"] = int(host_mids.nbytes)
    t0 = time.perf_counter()
    force(engine._put(f0))                   # uint8 input batch H2D
    dt = time.perf_counter() - t0
    report["h2d_mb_per_s"] = round(f0.nbytes / dt / 1e6, 1)

    # implied per-stage output-fps ceilings for THIS workload
    pairs = n_dec - 1
    n_out = pairs * (args.factor - 1) + n_dec
    mids_total = pairs * (args.factor - 1)
    ceil = {
        "decode": report["decode_fps"] / n_dec * n_out,
        "encode": report["encode_fps"],
        "device": report["device_mid_per_s"] / mids_total * n_out,
        "d2h": (report["d2h_mb_per_s"] * 1e6 * n_out
                / (mids_total * host_mids.nbytes / mids_per_dispatch)),
    }
    report["stage_output_fps_ceiling"] = {k: round(v, 1)
                                          for k, v in ceil.items()}

    # --- end to end -------------------------------------------------------
    stats = engine.interpolate_video_file(in_path, out_path,
                                          factor=args.factor,
                                          batch_pairs=args.batch_pairs)
    report["e2e_output_fps"] = round(stats["frames_per_second"], 2)
    report["e2e_seconds"] = round(stats["seconds"], 2)
    report["e2e_output_frames"] = stats["output_frames"]

    bound_stage = min(ceil, key=ceil.get)
    report["bound"] = bound_stage
    report["overlap_efficiency"] = round(
        report["e2e_output_fps"] / ceil[bound_stage], 3)

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as fobj:
        json.dump(report, fobj, indent=1)
    print(json.dumps(report, indent=1))

    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
