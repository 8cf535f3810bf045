"""3-method evaluation harness: U-Net vs linear vs optical-flow baselines.

Re-implements the reference's *working* evaluator
(``model/evaluation_simple.py:134-244``) and adopts its result schema —
``{methods, results_by_method, metrics_by_method}`` — which the larger
``model/evaluation.py`` was aiming at but never produced (its own reporting
functions KeyError on the flat dict it returns, SURVEY.md §8.7). One harness,
one schema, consumed by the full reporting suite (``report.py``).

TPU-native differences:
- U-Net predictions run **batched** through the warm engine (the reference
  re-runs single-pair inference per triplet with per-call H2D/D2H);
- PSNR/SSIM are computed **on device, batched** (``ops/psnr.py``,
  ``ops/ssim.py`` — skimage-semantics) for every method, including the host
  baselines; only the Farneback flow itself stays on host (cv2).
- per-triplet failures are isolated (reference behavior,
  ``evaluation_simple.py:215-217``): one bad file doesn't kill the run.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.triplets import Triplet, load_triplet_arrays, scan_triplets
from ..infer.engine import InterpolationEngine
from ..ops.flow import farneback_midpoint, linear_midpoint
from ..ops.pallas.ssim_fused import ssim_eval_auto
from ..ops.psnr import psnr as psnr_op

METHODS = ("unet", "linear", "optical_flow")

_psnr_jit = jax.jit(psnr_op)


def _batched_metrics(preds: np.ndarray, gts: np.ndarray):
    pd = jnp.asarray(preds)
    gd = jnp.asarray(gts)
    # SSIM via the fused Pallas kernel when eligible (grayscale <= ~720p),
    # XLA separable convs otherwise — identical numerics either way
    return np.asarray(_psnr_jit(pd, gd)), np.asarray(ssim_eval_auto(pd, gd))


def _aggregate(values: List[float]) -> Dict[str, float]:
    arr = np.asarray(values, np.float64)
    return {"avg": float(arr.mean()), "std": float(arr.std()),
            "min": float(arr.min()), "max": float(arr.max())}


def evaluate_model(engine: Optional[InterpolationEngine],
                   test_dir: Optional[str] = None,
                   triplets: Optional[Sequence[Triplet]] = None,
                   methods: Sequence[str] = METHODS,
                   batch_size: int = 8,
                   height: int = 256, width: int = 256,
                   save_frames_dir: Optional[str] = None,
                   max_triplets: Optional[int] = None,
                   progress: bool = False) -> dict:
    """Run every method over the triplet set; returns the simple-schema dict.

    ``engine`` may be None when 'unet' is not among ``methods``.
    """
    if triplets is None:
        if test_dir is None:
            raise ValueError("need test_dir or triplets")
        triplets = scan_triplets(test_dir)
    triplets = list(triplets)[:max_triplets]
    if not triplets:
        raise ValueError("no triplets found to evaluate")
    if "unet" in methods and engine is None:
        raise ValueError("'unet' method requires an engine")

    grayscale = engine.cfg.channels == 1 if engine is not None else True
    results_by_method: Dict[str, List[dict]] = {m: [] for m in methods}

    for start in range(0, len(triplets), batch_size):
        chunk = triplets[start:start + batch_size]
        f0s, f1s, gts, metas = [], [], [], []
        for t in chunk:
            try:
                f0, f1, gt = load_triplet_arrays(t, height, width, grayscale)
            except Exception as e:  # per-item isolation
                if progress:
                    print(f"  skipping {t.paths()[0]}: {e}")
                continue
            f0s.append(f0); f1s.append(f1); gts.append(gt)
            metas.append(t)
        if not metas:
            continue
        f0b, f1b, gtb = np.stack(f0s), np.stack(f1s), np.stack(gts)

        preds: Dict[str, np.ndarray] = {}
        if "unet" in methods:
            preds["unet"] = engine.interpolate_batch(f0b, f1b)
        if "linear" in methods:
            preds["linear"] = linear_midpoint(f0b, f1b)
        if "optical_flow" in methods:
            # cv2 releases the GIL inside Farneback: thread the host baseline
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(4, len(f0s))) as pool:
                preds["optical_flow"] = np.stack(
                    list(pool.map(lambda ab: farneback_midpoint(*ab),
                                  zip(f0s, f1s))))

        for m, pred in preds.items():
            ps, ss = _batched_metrics(pred, gtb)
            for i, t in enumerate(metas):
                results_by_method[m].append({
                    "video_name": t.video_name, "triplet_id": t.triplet_id,
                    "video_dir": t.video_dir, "frame_t0": t.frame_t0,
                    "frame_t1": t.frame_t1, "ground_truth": t.ground_truth,
                    "psnr": float(ps[i]), "ssim": float(ss[i])})
            if save_frames_dir:
                mdir = os.path.join(save_frames_dir, m)
                os.makedirs(mdir, exist_ok=True)
                from ..ops.image import save_image

                for i, t in enumerate(metas):
                    save_image(os.path.join(
                        mdir, f"{t.video_name}_{t.triplet_id:04d}.png"),
                        pred[i])
        if progress:
            done = min(start + batch_size, len(triplets))
            print(f"  evaluated {done}/{len(triplets)} triplets")

    metrics_by_method = {
        m: {"psnr": _aggregate([r["psnr"] for r in rs]),
            "ssim": _aggregate([r["ssim"] for r in rs])}
        for m, rs in results_by_method.items() if rs}
    return {"methods": [m for m in methods if results_by_method.get(m)],
            "num_triplets": len(next(iter(results_by_method.values()), [])),
            "results_by_method": results_by_method,
            "metrics_by_method": metrics_by_method}
