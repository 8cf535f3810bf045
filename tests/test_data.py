"""Data-layer tests: triplet scan, splits, loader batching, video IO."""

import os

import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.data.loader import TripletLoader
from ai_based_frame_interpolation_tpu.data.synthetic import (
    moving_circle_frames, write_fixture_tree, write_fixture_video)
from ai_based_frame_interpolation_tpu.data.triplets import (
    scan_triplets, split_triplets)
from ai_based_frame_interpolation_tpu.data.video import (
    AsyncVideoWriter, VideoReader, VideoWriter)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("trainset")
    write_fixture_tree(str(root), num_videos=2, num_frames=6,
                       height=32, width=32)
    return str(root)


def test_moving_circle_is_deterministic():
    a = moving_circle_frames(3, 64, 64, seed=7)
    b = moving_circle_frames(3, 64, 64, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 64, 64, 1) and a.dtype == np.uint8
    # the disc actually moves
    assert (a[0] != a[2]).any()


def test_moving_scene_properties():
    from ai_based_frame_interpolation_tpu.data.synthetic import \
        moving_scene_frames

    a = moving_scene_frames(5, 64, 64, seed=11)
    b = moving_scene_frames(5, 64, 64, seed=11)
    np.testing.assert_array_equal(a, b)          # deterministic
    assert a.shape == (5, 64, 64, 1) and a.dtype == np.uint8
    assert (a[0] != a[4]).mean() > 0.2           # the scene actually moves
    # different seeds give genuinely different scenes
    c = moving_scene_frames(5, 64, 64, seed=12)
    assert (a != c).mean() > 0.3
    rgb = moving_scene_frames(3, 48, 48, channels=3, seed=1)
    assert rgb.shape == (3, 48, 48, 3)
    # motion is linear: the true midpoint of (t, t+2) is close to frame t+1
    # (much closer than the endpoints are to each other)
    mid_err = np.abs(a[1].astype(np.float32) -
                     0.5 * (a[0].astype(np.float32) + a[2].astype(np.float32)))
    end_err = np.abs(a[0].astype(np.float32) - a[2].astype(np.float32))
    assert mid_err.mean() < end_err.mean()


def test_moving_scene_hard_tier():
    from ai_based_frame_interpolation_tpu.data.synthetic import \
        moving_scene_frames

    a = moving_scene_frames(6, 64, 64, seed=21, motion="hard")
    b = moving_scene_frames(6, 64, 64, seed=21, motion="hard")
    np.testing.assert_array_equal(a, b)          # deterministic
    assert a.shape == (6, 64, 64, 1) and a.dtype == np.uint8
    assert (a[0] != a[5]).mean() > 0.2           # scene moves
    # the hard tier really changes the motion model vs linear (same seed)
    lin = moving_scene_frames(6, 64, 64, seed=21, motion="linear")
    assert (a != lin).mean() > 0.2
    # frame t+1 stays a far better midpoint estimate than the endpoints are
    # of each other (the rendered-ground-truth contract, curved motion too)
    mid_err = np.abs(a[1].astype(np.float32) -
                     0.5 * (a[0].astype(np.float32) + a[2].astype(np.float32)))
    end_err = np.abs(a[0].astype(np.float32) - a[2].astype(np.float32))
    assert mid_err.mean() < end_err.mean()
    with pytest.raises(ValueError):
        moving_scene_frames(3, 32, 32, motion="nope")


def test_moving_scene_flicker_tier():
    """The flicker tier modulates per-frame exposure with a 2.5-5 frame
    period: frame means must deviate from the no-flicker clip AND the
    modulation must be non-monotonic (a ramp alone is monotonic)."""
    from ai_based_frame_interpolation_tpu.data.synthetic import \
        moving_scene_frames

    a = moving_scene_frames(8, 64, 64, seed=31, flicker=0.2)
    b = moving_scene_frames(8, 64, 64, seed=31, flicker=0.2)
    np.testing.assert_array_equal(a, b)          # deterministic
    base = moving_scene_frames(8, 64, 64, seed=31, flicker=0.0)
    am = a.reshape(8, -1).mean(axis=1)
    bm = base.reshape(8, -1).mean(axis=1)
    # exposure moves by several gray levels relative to the stable clip
    assert np.abs(am - bm).max() > 3.0
    # non-monotonic modulation: the per-frame gain ratio changes sign
    ratio = am / np.maximum(bm, 1e-6)
    diffs = np.diff(ratio)
    assert (diffs > 0).any() and (diffs < 0).any()
    # geometry untouched: same scene, only gain differs -> correlation
    # stays high (0.94 measured at flicker=0.2; pure noise would be ~0)
    assert np.corrcoef(a.ravel(), base.ravel())[0, 1] > 0.9


def test_write_scene_tree_feeds_the_triplet_scanner(tmp_path):
    from ai_based_frame_interpolation_tpu.data.synthetic import \
        write_scene_tree

    dirs = write_scene_tree(str(tmp_path), num_videos=2, num_frames=5,
                            height=32, width=32)
    assert len(dirs) == 2
    triplets = scan_triplets(str(tmp_path))
    assert len(triplets) == 2 * 3


def test_scan_triplets_layout(fixture_root):
    # 6 frames per video -> 4 triplets (i, i+2 -> i+1), reference
    # model/train.py:96-118
    triplets = scan_triplets(fixture_root)
    assert len(triplets) == 2 * 4
    t = triplets[0]
    assert t.frame_t0 == "frame_000.png"
    assert t.ground_truth == "frame_001.png"
    assert t.frame_t1 == "frame_002.png"


def test_scan_missing_dir_raises():
    with pytest.raises(FileNotFoundError):
        scan_triplets("/nonexistent/path")


def test_split_deterministic_and_disjoint(fixture_root):
    triplets = scan_triplets(fixture_root)
    tr1, va1 = split_triplets(triplets, 0.25, seed=3)
    tr2, va2 = split_triplets(triplets, 0.25, seed=3)
    assert [t.paths() for t in tr1] == [t.paths() for t in tr2]
    assert len(va1) == 2
    all_paths = {t.paths() for t in tr1} | {t.paths() for t in va1}
    assert len(all_paths) == len(triplets)


def test_loader_shapes_and_epoch_reshuffle(fixture_root):
    triplets = scan_triplets(fixture_root)
    loader = TripletLoader(triplets, batch_size=4, height=32, width=32,
                           num_workers=2, seed=1)
    b1 = [b for b in loader]
    b2 = [b for b in loader]
    assert len(b1) == len(loader) == 2
    for b in b1:
        assert b["f0"].shape == (4, 32, 32, 1) and b["f0"].dtype == np.uint8
        assert set(b) == {"f0", "f1", "gt"}
    # different epoch order (shuffle reseeds per epoch)
    assert any((x["f0"] != y["f0"]).any() for x, y in zip(b1, b2))


def test_loader_remainder_handling(fixture_root):
    triplets = scan_triplets(fixture_root)  # 8 triplets
    loader = TripletLoader(triplets, batch_size=3, height=32, width=32,
                           drop_remainder=False, shuffle=False, num_workers=1)
    sizes = [b["f0"].shape[0] for b in loader]
    assert sizes == [3, 3, 2]


def test_loader_accepts_zero_workers(fixture_root):
    # num_workers=0 means "synchronous decode" (reference DataLoader
    # semantics); it must not crash ThreadPoolExecutor(max_workers=0).
    triplets = scan_triplets(fixture_root)
    loader = TripletLoader(triplets, batch_size=4, height=32, width=32,
                           shuffle=False, num_workers=0)
    sizes = [b["f0"].shape[0] for b in loader]
    assert sizes == [4, 4]


def test_video_roundtrip(tmp_path):
    path = str(tmp_path / "clip.mp4")
    frames = moving_circle_frames(8, 64, 64, channels=3)
    with VideoWriter(path, fps=24) as w:
        for f in frames:
            w.write(f)
    r = VideoReader(path)
    assert abs(r.fps - 24) < 0.1
    out = list(r)
    assert len(out) == 8
    assert out[0].shape == (64, 64, 3)
    # lossy codec: just require gross structure to survive
    assert abs(float(out[3].mean()) - float(frames[3].mean())) < 10


def test_async_writer_matches_sync(tmp_path):
    frames = moving_circle_frames(10, 48, 48, channels=3)
    p1, p2 = str(tmp_path / "s.mp4"), str(tmp_path / "a.mp4")
    with VideoWriter(p1, fps=30) as w:
        for f in frames:
            w.write(f)
    with AsyncVideoWriter(p2, fps=30) as w:
        for f in frames:
            w.write(f)
    a = list(VideoReader(p1))
    b = list(VideoReader(p2))
    assert len(a) == len(b) == 10
    np.testing.assert_array_equal(a[5], b[5])


def test_fixture_video_writer(tmp_path):
    p = write_fixture_video(str(tmp_path / "fix.mp4"), num_frames=6,
                            height=48, width=48)
    assert os.path.getsize(p) > 0
    assert len(list(VideoReader(p))) == 6


def test_grayscale_video_reader(tmp_path):
    path = str(tmp_path / "g.mp4")
    with VideoWriter(path, fps=30) as w:
        for f in moving_circle_frames(4, 48, 48, channels=3):
            w.write(f)
    frames = list(VideoReader(path, grayscale=True))
    assert frames[0].shape == (48, 48, 1)


def test_async_reader_matches_sync(tmp_path):
    from ai_based_frame_interpolation_tpu.data.video import AsyncVideoReader

    path = str(tmp_path / "clip.mp4")
    with VideoWriter(path, fps=20) as w:
        for f in moving_circle_frames(8, 48, 48, channels=3):
            w.write(f)
    sync = list(VideoReader(path))
    asyn = list(AsyncVideoReader(path, max_queue=3))
    assert len(sync) == len(asyn) == 8
    for a, b in zip(sync, asyn):
        np.testing.assert_array_equal(a, b)
    # grayscale flavor too
    g = list(AsyncVideoReader(path, grayscale=True))
    assert g[0].shape == (48, 48, 1)


def test_grayscale_writer_roundtrip(tmp_path):
    # isColor=False fast path: 1-channel frames encode and read back
    path = str(tmp_path / "gray.mp4")
    frames = moving_circle_frames(6, 48, 48, channels=1)
    with VideoWriter(path, fps=20) as w:
        for f in frames:
            w.write(f)
    back = list(VideoReader(path, grayscale=True))
    assert len(back) == 6 and back[0].shape == (48, 48, 1)
    # lossy codec: compare loosely
    assert np.mean(np.abs(back[0].astype(int) - frames[0].astype(int))) < 8


def test_loader_isolates_corrupt_files(tmp_path):
    import cv2

    from ai_based_frame_interpolation_tpu.data.synthetic import \
        moving_circle_frames

    vdir = tmp_path / "vid"
    vdir.mkdir()
    frames = moving_circle_frames(6, 32, 32)
    for i, f in enumerate(frames):
        cv2.imwrite(str(vdir / f"frame_{i:03d}.png"), f[..., 0])
    (vdir / "frame_002.png").write_bytes(b"not a png")   # corrupt one frame
    triplets = scan_triplets(str(tmp_path))
    loader = TripletLoader(triplets, batch_size=4, height=32, width=32,
                           shuffle=False, num_workers=1)
    batches = list(loader)                # must not raise
    assert batches and batches[0]["f0"].shape == (4, 32, 32, 1)


def test_loader_augmentation_label_consistent(fixture_root):
    """augment=True applies flips to all three frames alike and may swap
    f0<->f1 (midpoint-invariant); it is deterministic per (seed, epoch,
    item) and never mutates the ground-truth relationship."""
    triplets = scan_triplets(fixture_root)
    plain = TripletLoader(triplets, batch_size=4, height=32, width=32,
                          shuffle=False, num_workers=1, seed=3)
    auged = TripletLoader(triplets, batch_size=4, height=32, width=32,
                          shuffle=False, num_workers=1, seed=3, augment=True)
    pb = next(iter(plain))
    ab = next(iter(auged))
    # determinism: a second identically-configured loader reproduces epoch 1
    ab2 = next(iter(TripletLoader(triplets, batch_size=4, height=32,
                                  width=32, shuffle=False, num_workers=1,
                                  seed=3, augment=True)))
    for k in ("f0", "f1", "gt"):
        np.testing.assert_array_equal(ab[k], ab2[k])

    import itertools

    changed = 0
    for i in range(4):
        p = {k: pb[k][i] for k in pb}
        a = {k: ab[k][i] for k in ab}
        # the augmented triplet must be reachable by some combination of
        # hflip/vflip/temporal swap applied consistently to all frames
        for hf, vf, ts in itertools.product((False, True), repeat=3):
            f0, f1, gt = p["f0"], p["f1"], p["gt"]
            if hf:
                f0, f1, gt = (np.flip(x, 1) for x in (f0, f1, gt))
            if vf:
                f0, f1, gt = (np.flip(x, 0) for x in (f0, f1, gt))
            if ts:
                f0, f1 = f1, f0
            if (np.array_equal(a["f0"], f0) and np.array_equal(a["f1"], f1)
                    and np.array_equal(a["gt"], gt)):
                if hf or vf or ts:
                    changed += 1
                break
        else:
            raise AssertionError(f"item {i}: augmented triplet is not a "
                                 "consistent flip/swap of the original")
    assert changed >= 1        # with 4 items, some augmentation fired
