"""Trained-weight SSIM parity record — the BASELINE.md quality gate.

Trains happen in this framework; the gate asks that on IDENTICAL weights the
reference PyTorch compute graph (``/root/reference/model/unet.py`` +
``model/inference.py:101-122`` pre/post semantics) and this framework score
the same SSIM against ground truth (|delta| <= 0.005).

This script closes the loop the random-weight test
(``tests/test_parity_ssim_delta.py``) leaves open (round-1 VERDICT missing-2):

1. load a TRAINED checkpoint (exact parity architecture: s2d=1, grayscale),
2. export it to the reference ``.pth`` format (``train/checkpoint.export_pth``
   — the ``fi-tpu convert`` path),
3. reload the ``.pth`` and run the torch functional oracle over the held-out
   test triplets,
4. run the same triplets through our engine (f32, CPU, so the delta measures
   implementation parity rather than bf16 rounding),
5. record per-triplet SSIM-vs-GT for both implementations, the delta, and
   the raw output agreement.

Run hermetically on CPU (the TPU is not needed and may be busy training):

    env -u PYTHONPATH PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        python scripts/parity_delta.py \
        --checkpoint /tmp/scenes_ab/ck_parity200 \
        --test-dir /tmp/scenes_ab/test --output docs/parity_delta.json
"""

import argparse
import importlib.util
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _load_oracle():
    """The torch functional replica of the reference compute graph lives in
    tests/ (golden-tested against weight import both ways)."""
    spec = importlib.util.spec_from_file_location(
        "tci", os.path.join(REPO, "tests", "test_checkpoint_import.py"))
    tci = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tci)
    return tci


def torch_midpoint_u8(tci, sd, f0_u8, f1_u8):
    """Reference inference semantics: [-1,1] normalize, forward,
    denormalize + round to uint8 (reference model/inference.py:11-63)."""
    import torch

    def norm(u8):
        x = u8.astype(np.float32)[None, None, :, :, 0] / 255.0
        return x * 2.0 - 1.0

    with torch.no_grad():
        out = tci.torch_functional_forward(sd, norm(f0_u8), norm(f1_u8))
    y = np.clip((out[0, 0] + 1.0) * 0.5, 0.0, 1.0) * 255.0
    return np.round(y).astype(np.uint8)[..., None]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="trained orbax checkpoint dir (parity config)")
    p.add_argument("--test-dir", required=True,
                   help="held-out triplet tree (reference layout)")
    p.add_argument("--size", type=int, default=256,
                   help="eval resolution (reference preprocessing resizes "
                        "everything to 256x256, model/inference.py:11-41)")
    p.add_argument("--output", default=None, help="write JSON record here")
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import torch

    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)
    from ai_based_frame_interpolation_tpu.data.triplets import scan_triplets
    from ai_based_frame_interpolation_tpu.models import build_model
    from ai_based_frame_interpolation_tpu.ops.ssim import ssim_eval
    from ai_based_frame_interpolation_tpu.train.checkpoint import (
        export_pth, load_variables)

    variables, cfg = load_variables(args.checkpoint)
    if cfg.space_to_depth != 1 or cfg.channels != 1 or cfg.arch != "unet":
        raise SystemExit("parity delta requires the exact reference "
                         f"architecture (s2d=1, gray, unet); got {cfg}")

    # round-trip through the reference checkpoint format (the convert path)
    with tempfile.TemporaryDirectory() as tmp:
        pth = os.path.join(tmp, "best_model.pth")
        export_pth(pth, variables, cfg)
        blob = torch.load(pth, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in blob["model_state_dict"].items()}

    tci = _load_oracle()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = build_model(cfg, compute_dtype=jnp.float32)
        engine = InterpolationEngine(model, jax.device_put(variables, cpu),
                                     compute_dtype=jnp.float32)

        def load(path):
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
            if img.shape != (args.size, args.size):
                img = cv2.resize(img, (args.size, args.size),
                                 interpolation=cv2.INTER_LINEAR)
            return img[..., None]

        rows = []
        for t in scan_triplets(args.test_dir):
            f0 = load(os.path.join(t.video_dir, t.frame_t0))
            gt = load(os.path.join(t.video_dir, t.ground_truth))
            f1 = load(os.path.join(t.video_dir, t.frame_t1))
            ours = engine.interpolate_pair(f0, f1)
            theirs = torch_midpoint_u8(tci, sd, f0, f1)
            s_ours = float(ssim_eval(jnp.asarray(ours), jnp.asarray(gt)))
            s_theirs = float(ssim_eval(jnp.asarray(theirs), jnp.asarray(gt)))
            rows.append({
                "video": os.path.basename(t.video_dir),
                "t0": t.frame_t0,
                "ssim_ours": s_ours,
                "ssim_reference": s_theirs,
                "delta": s_ours - s_theirs,
                "max_abs_px_diff": int(np.max(np.abs(
                    ours.astype(np.int16) - theirs.astype(np.int16)))),
            })
            print(f"{rows[-1]['video']}/{t.frame_t0}: "
                  f"ours {s_ours:.5f}  ref {s_theirs:.5f}  "
                  f"delta {s_ours - s_theirs:+.5f}  "
                  f"px {rows[-1]['max_abs_px_diff']}")

    deltas = np.array([r["delta"] for r in rows])
    summary = {
        "checkpoint": args.checkpoint,
        "test_dir": args.test_dir,
        "triplets": len(rows),
        "resolution": args.size,
        "ssim_ours_mean": float(np.mean([r["ssim_ours"] for r in rows])),
        "ssim_reference_mean": float(np.mean([r["ssim_reference"]
                                              for r in rows])),
        "delta_mean": float(deltas.mean()),
        "delta_max_abs": float(np.abs(deltas).max()),
        "max_abs_px_diff": max(r["max_abs_px_diff"] for r in rows),
        "gate": "PASS" if float(np.abs(deltas).max()) <= 0.005 else "FAIL",
    }
    print(json.dumps(summary, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump({"summary": summary, "rows": rows}, f, indent=2)
        print(f"wrote {args.output}")
    return 0 if summary["gate"] == "PASS" else 1


if __name__ == "__main__":
    raise SystemExit(main())
