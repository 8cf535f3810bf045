"""CLI integration tests — every subcommand through the real argv surface.

The reference's `main.py infer|video` die on a nonexistent import
(SURVEY.md §8.2) and `--batch-size`/`--lr` are silently dropped (§8.5);
these tests pin the fixed behavior.
"""

import json
import os

import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.cli import build_parser, main
from ai_based_frame_interpolation_tpu.data.synthetic import (
    moving_circle_frames, write_fixture_tree, write_fixture_video)


@pytest.fixture()
def frames_on_disk(tmp_path):
    import cv2

    frames = moving_circle_frames(3, 64, 64)
    paths = []
    for i, f in enumerate(frames):
        p = str(tmp_path / f"f{i}.png")
        cv2.imwrite(p, f[..., 0])
        paths.append(p)
    return paths


def test_parser_has_all_subcommands():
    p = build_parser()
    subs = next(a for a in p._actions
                if isinstance(a, __import__("argparse")._SubParsersAction))
    assert set(subs.choices) == {"train", "infer", "video", "eval",
                                 "serve", "info", "demo", "convert",
                                 "dataset"}


def test_dataset_command(tmp_path, capsys):
    out = str(tmp_path / "scenes")
    assert main(["dataset", "--output-dir", out, "--videos", "2",
                 "--frames", "5", "--size", "32"]) == 0
    from ai_based_frame_interpolation_tpu.data.triplets import scan_triplets
    assert len(scan_triplets(out)) == 2 * 3
    assert "6 triplets" in capsys.readouterr().out


def test_train_flags_honored():
    # --batch-size and --lr exist and parse (the reference dropped them)
    args = build_parser().parse_args(
        ["train", "--data-dir", "d", "--epochs", "2", "--batch-size", "16",
         "--lr", "0.001"])
    assert args.batch_size == 16 and args.lr == 0.001


def test_infer_single_frame(tmp_path, frames_on_disk, capsys):
    out = str(tmp_path / "mid.png")
    rc = main(["infer", "--frame1", frames_on_disk[0],
               "--frame2", frames_on_disk[2], "--output", out,
               "--model", str(tmp_path / "nonexistent"),
               "--height", "64", "--width", "64"])
    assert rc == 0
    assert os.path.exists(out)
    import cv2

    img = cv2.imread(out, cv2.IMREAD_GRAYSCALE)
    assert img.shape == (64, 64)


def test_infer_multi_writes_video(tmp_path, frames_on_disk):
    out = str(tmp_path / "multi.png")
    rc = main(["infer", "--frame1", frames_on_disk[0],
               "--frame2", frames_on_disk[2], "--output", out,
               "--num-intermediate", "3", "--save-comparison",
               "--model", str(tmp_path / "none"),
               "--height", "64", "--width", "64"])
    assert rc == 0
    base = str(tmp_path / "multi")
    for i in (1, 2, 3):
        assert os.path.exists(f"{base}_intermediate_{i:02d}.png")
    assert os.path.exists(f"{base}_video.mp4")
    assert os.path.exists(f"{base}_comparison.mp4")


def test_video_command(tmp_path):
    src = write_fixture_video(str(tmp_path / "in.mp4"), num_frames=5,
                              height=48, width=48, fps=10)
    out = str(tmp_path / "out.mp4")
    rc = main(["video", "--input", src, "--output", out, "--factor", "2",
               "--model", str(tmp_path / "none"), "--batch-pairs", "2"])
    assert rc == 0
    from ai_based_frame_interpolation_tpu.data.video import VideoReader

    assert len(list(VideoReader(out))) == 9


def test_video_missing_input_fails_cleanly(tmp_path):
    rc = main(["video", "--input", str(tmp_path / "missing.mp4"),
               "--output", str(tmp_path / "o.mp4"),
               "--model", str(tmp_path / "none")])
    assert rc == 1


def test_train_and_info_roundtrip(tmp_path, capsys):
    root = str(tmp_path / "data")
    write_fixture_tree(root, num_videos=1, num_frames=6, height=32, width=32)
    ckpt = str(tmp_path / "ckpt")
    # full-size model would be slow; this is the real CLI path with the
    # real 17M-param model kept to ONE tiny epoch on 4 triplets
    rc = main(["train", "--data-dir", root, "--epochs", "1",
               "--batch-size", "2", "--lr", "0.001", "--val-split", "0.25",
               "--height", "32", "--width", "32", "--checkpoint-dir", ckpt,
               "--num-devices", "1", "--num-workers", "1"])
    assert rc == 0
    assert os.path.isdir(os.path.join(ckpt, "best"))
    assert os.path.isdir(os.path.join(ckpt, "variables"))

    rc = main(["info", "--model", ckpt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "17,262,401" in out and "epochs completed" in out

    # resume one more epoch through the CLI
    rc = main(["train", "--data-dir", root, "--epochs", "2", "--resume",
               "--batch-size", "2", "--height", "32", "--width", "32",
               "--checkpoint-dir", ckpt, "--num-devices", "1",
               "--num-workers", "1"])
    assert rc == 0
    meta = json.load(open(os.path.join(ckpt, "latest_meta.json")))
    assert meta["epoch"] == 1
    assert len(meta["history"]["train_loss"]) == 2


def test_eval_command(tmp_path):
    root = str(tmp_path / "data")
    write_fixture_tree(root, num_videos=1, num_frames=5, height=48, width=48)
    outdir = str(tmp_path / "results")
    rc = main(["eval", "--test-dir", root, "--output-dir", outdir,
               "--model", str(tmp_path / "none"),
               "--height", "48", "--width", "48", "--batch-size", "3"])
    assert rc == 0
    assert os.path.exists(os.path.join(outdir, "results.json"))
    assert os.path.exists(os.path.join(outdir, "report.md"))
    assert os.path.exists(os.path.join(outdir, "plots",
                                       "combined_comparison.png"))


def test_demo_command(tmp_path, capsys):
    out = str(tmp_path / "demo_data")
    rc = main(["demo", "--output-dir", out, "--size", "48"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "demo complete" in text
    assert os.path.exists(os.path.join(out, "sample_clip_2x.mp4"))
    assert os.path.exists(os.path.join(out, "video_00", "frame_000.png"))


def test_convert_roundtrip(tmp_path):
    import torch

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "tci", os.path.join(os.path.dirname(__file__),
                            "test_checkpoint_import.py"))
    tci = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tci)

    rng = np.random.default_rng(0)
    sd = tci.random_state_dict(rng)
    pth = str(tmp_path / "best_model.pth")
    torch.save({"model_state_dict": {k: torch.from_numpy(np.asarray(v))
                                     for k, v in sd.items()}}, pth)
    orbax_dir = str(tmp_path / "ckpt")
    assert main(["convert", "--input", pth, "--output", orbax_dir]) == 0
    assert os.path.isdir(os.path.join(orbax_dir, "variables"))
    back = str(tmp_path / "back.pth")
    assert main(["convert", "--input", orbax_dir, "--output", back]) == 0
    re = torch.load(back, map_location="cpu", weights_only=False)
    np.testing.assert_allclose(
        re["model_state_dict"]["unet.inc.double_conv.0.weight"].numpy(),
        np.asarray(sd["unet.inc.double_conv.0.weight"]))


def test_train_batch_larger_than_dataset_clamps(tmp_path, capsys):
    # a batch size above the train-set size would drop every (partial) batch
    # => zero steps/epoch; the CLI clamps it with a note instead
    root = str(tmp_path / "data")
    write_fixture_tree(root, num_videos=1, num_frames=6, height=32, width=32)
    ckpt = str(tmp_path / "ckpt")
    rc = main(["train", "--data-dir", root, "--epochs", "1",
               "--batch-size", "64", "--val-split", "0.25",
               "--height", "32", "--width", "32", "--checkpoint-dir", ckpt,
               "--num-devices", "1", "--num-workers", "1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "clamped to 3" in out
    assert "train nan" not in out
    assert os.path.isdir(os.path.join(ckpt, "best"))
