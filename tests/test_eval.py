"""Evaluation harness + reporting tests on the synthetic fixture."""

import json
import os

import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.data.synthetic import write_fixture_tree
from ai_based_frame_interpolation_tpu.eval.harness import evaluate_model
from ai_based_frame_interpolation_tpu.eval.report import (
    generate_full_report, print_summary, save_json, write_markdown_report)
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.ops.flow import (farneback_midpoint,
                                                       linear_midpoint)


@pytest.fixture(scope="module")
def test_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("evalset"))
    write_fixture_tree(root, num_videos=2, num_frames=5, height=64, width=64)
    return root


@pytest.fixture(scope="module")
def engine():
    return InterpolationEngine.random_init(ModelConfig(base_width=4))


@pytest.fixture(scope="module")
def results(engine, test_dir):
    return evaluate_model(engine, test_dir=test_dir, batch_size=4,
                          height=64, width=64)


def test_schema(results):
    # the coherent schema adopted from evaluation_simple.py:220-244
    assert set(results["methods"]) == {"unet", "linear", "optical_flow"}
    assert results["num_triplets"] == 6
    for m in results["methods"]:
        assert len(results["results_by_method"][m]) == 6
        agg = results["metrics_by_method"][m]
        for metric in ("psnr", "ssim"):
            assert set(agg[metric]) == {"avg", "std", "min", "max"}
            assert agg[metric]["min"] <= agg[metric]["avg"] <= agg[metric]["max"]


def test_baselines_beat_random_unet(results):
    # random-weight U-Net must lose to linear blending on the fixture —
    # sanity that metrics actually discriminate
    mm = results["metrics_by_method"]
    assert mm["linear"]["psnr"]["avg"] > mm["unet"]["psnr"]["avg"]


def test_linear_baseline_values():
    f1 = np.zeros((16, 16, 1), np.uint8)
    f2 = np.full((16, 16, 1), 100, np.uint8)
    assert int(linear_midpoint(f1, f2).mean()) == 50


def test_farneback_static_scene_is_identity():
    rng = np.random.default_rng(0)
    f = (rng.random((64, 64, 1)) * 255).astype(np.uint8)
    mid = farneback_midpoint(f, f)
    # zero flow -> warp is (near-)identity
    assert np.abs(mid.astype(int) - f.astype(int)).mean() < 2


def test_optical_flow_beats_linear_on_motion(tmp_path):
    # gentle pure translation (4 px/frame): flow warping must beat blending.
    # (the default fixture moves 40 px/frame at 64x64 — beyond Farneback's
    # search range, where flow degenerates to near-identity warping)
    import cv2

    from ai_based_frame_interpolation_tpu.data.synthetic import \
        moving_circle_frames

    root = tmp_path / "gentle" / "vid"
    root.mkdir(parents=True)
    frames = moving_circle_frames(5, 64, 64, radius=12, step=4, noise=3)
    for i, f in enumerate(frames):
        cv2.imwrite(str(root / f"frame_{i:03d}.png"), f[..., 0])
    res = evaluate_model(None, test_dir=str(tmp_path / "gentle"),
                         methods=("linear", "optical_flow"),
                         height=64, width=64)
    mm = res["metrics_by_method"]
    assert mm["optical_flow"]["psnr"]["avg"] > mm["linear"]["psnr"]["avg"]


def test_eval_without_unet_needs_no_engine(test_dir):
    res = evaluate_model(None, test_dir=test_dir, methods=("linear",),
                         height=64, width=64)
    assert res["methods"] == ["linear"]


def test_eval_engine_required_for_unet(test_dir):
    with pytest.raises(ValueError):
        evaluate_model(None, test_dir=test_dir, methods=("unet",))


def test_max_triplets(engine, test_dir):
    res = evaluate_model(engine, test_dir=test_dir, height=64, width=64,
                         max_triplets=3)
    assert res["num_triplets"] == 3


def test_print_summary_runs(results):
    lines = []
    print_summary(results, log_fn=lines.append)
    text = "\n".join(lines)
    assert "U-Net" in text and "vs linear" in text


def test_full_report_artifacts(results, engine, tmp_path):
    out = str(tmp_path / "report")
    artifacts = generate_full_report(results, out, engine=engine,
                                     height=64, width=64)
    data = json.load(open(artifacts["json"]))
    assert data["methods"] == list(results["methods"])
    assert os.path.getsize(artifacts["csv"]) > 0
    for p in artifacts["plots"]:
        assert os.path.exists(p), p
    report = open(artifacts["report"]).read()
    assert "Rankings" in report and "Quality bands" in report
    assert len(artifacts["comparisons"]) == 3


def test_markdown_quality_bands(tmp_path):
    res = {"methods": ["linear"], "num_triplets": 1,
           "results_by_method": {"linear": [{"psnr": 31.0, "ssim": 0.97,
                                             "video_name": "v", "triplet_id": 0,
                                             "video_dir": "/x"}]},
           "metrics_by_method": {"linear": {
               "psnr": {"avg": 31.0, "std": 0.0, "min": 31.0, "max": 31.0},
               "ssim": {"avg": 0.97, "std": 0.0, "min": 0.97, "max": 0.97}}}}
    path = write_markdown_report(res, str(tmp_path / "r.md"))
    text = open(path).read()
    assert "| excellent | excellent |" in text
