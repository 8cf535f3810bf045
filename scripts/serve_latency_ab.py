"""Serving-latency A/B: transposed core (core_impl=auto) vs XLA core.

Round-4 demoted the transposed Pallas core to a latency OPTION: the batch
sweep showed it wins exactly the serving regime (b1 +2.9%, b32 +5.1%) and
loses the b128 bench regime — but `cli serve` ships core_impl="xla"
without a latency measurement behind that default (round-4 VERDICT task
6). This script serves the production 1080p gray config through the REAL
stack — stdlib HTTP server + continuous batcher + engine — and measures
request latency p50/p95 for both impls, single-stream and concurrent,
interleaved A/B/A in ONE process (TPU sessions drift run-to-run,
CLAUDE.md gotcha 10; interleaving beats drift).

Usage (on the TPU):
    python scripts/serve_latency_ab.py [--requests 30] [--threads 4]
Writes docs/serve_latency_ab.json and prints a table; the serve default
decision rides on these numbers (docs/PERF.md round-5 section).
"""

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_multipart(fields, files):
    """fields: {name: str}; files: {name: (filename, bytes)} -> body, ctype."""
    boundary = uuid.uuid4().hex
    out = io.BytesIO()
    for name, val in fields.items():
        out.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f"name=\"{name}\"\r\n\r\n{val}\r\n".encode())
    for name, (fname, data) in files.items():
        out.write(f"--{boundary}\r\nContent-Disposition: form-data; "
                  f"name=\"{name}\"; filename=\"{fname}\"\r\n"
                  f"Content-Type: image/png\r\n\r\n".encode())
        out.write(data)
        out.write(b"\r\n")
    out.write(f"--{boundary}--\r\n".encode())
    return out.getvalue(), f"multipart/form-data; boundary={boundary}"


def percentile(xs, q):
    xs = sorted(xs)
    i = min(len(xs) - 1, int(round(q / 100 * (len(xs) - 1))))
    return xs[i]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--requests", type=int, default=30,
                   help="sequential requests per single-stream phase")
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--per-thread", type=int, default=8)
    p.add_argument("--out", default="docs/serve_latency_ab.json")
    args = p.parse_args(argv)

    import cv2
    import numpy as np

    import jax

    from ai_based_frame_interpolation_tpu.utils.cache import host_keyed
    jax.config.update("jax_compilation_cache_dir",
                      host_keyed("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ai_based_frame_interpolation_tpu.config import (ModelConfig,
                                                         ServeConfig)
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)
    from ai_based_frame_interpolation_tpu.serve.server import Server

    # request payload: two structured 1080p frames (encode once, reuse)
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:args.height, 0:args.width].astype(np.float32)
    f1 = (127 + 80 * np.sin(x / 17.0) * np.cos(y / 11.0)).astype(np.uint8)
    f2 = np.roll(f1, 13, axis=1)
    ok1, png1 = cv2.imencode(".png", f1)
    ok2, png2 = cv2.imencode(".png", f2)
    assert ok1 and ok2
    body, ctype = build_multipart({"num_intermediate": "1", "fps": "30"},
                                  {"frame1": ("a.png", png1.tobytes()),
                                   "frame2": ("b.png", png2.tobytes())})

    def post(port):
        t0 = time.perf_counter()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/interpolate", data=body,
            headers={"Content-Type": ctype})
        with urllib.request.urlopen(req, timeout=300) as resp:
            resp.read()
            assert resp.status == 200
        return time.perf_counter() - t0

    def measure(engine, phase_reqs, threads):
        cfg = ServeConfig(host="127.0.0.1", port=0)
        srv = Server(engine, cfg,
                     resolution=(args.height, args.width)).start_background()
        try:
            post(srv.port)                      # warmup/compile
            single = [post(srv.port) for _ in range(phase_reqs)]
            lock = threading.Lock()
            conc = []

            def worker():
                for _ in range(args.per_thread):
                    dt = post(srv.port)
                    with lock:
                        conc.append(dt)

            ths = [threading.Thread(target=worker) for _ in range(threads)]
            t0 = time.perf_counter()
            for t in ths:
                t.start()
            for t in ths:
                t.join()
            wall = time.perf_counter() - t0
            return single, conc, wall
        finally:
            srv.shutdown()

    results = {}
    # interleaved A/B/A: xla, auto, xla — drift shows up as a disagreement
    # between the two xla phases
    for tag, impl in (("xla_1", "xla"), ("auto", "auto"), ("xla_2", "xla")):
        eng = InterpolationEngine.random_init(
            ModelConfig(space_to_depth=4, residual=True, refine_width=64))
        eng.core_impl = impl
        print(f"== phase {tag} (core_impl={impl})", flush=True)
        single, conc, wall = measure(eng, args.requests, args.threads)
        results[tag] = {
            "core_impl": impl,
            "single_p50_ms": round(percentile(single, 50) * 1e3, 1),
            "single_p95_ms": round(percentile(single, 95) * 1e3, 1),
            "single_mean_ms": round(sum(single) / len(single) * 1e3, 1),
            "concurrent_p50_ms": round(percentile(conc, 50) * 1e3, 1),
            "concurrent_p95_ms": round(percentile(conc, 95) * 1e3, 1),
            "concurrent_rps": round(len(conc) / wall, 2),
            "n_single": len(single), "n_concurrent": len(conc),
        }
        print(json.dumps(results[tag]), flush=True)
        del eng
        jax.clear_caches()

    report = {"config": vars(args), "phases": results}
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
