"""Native fastimage kernels vs their numpy fallbacks — both paths exercised."""

import importlib
import os

import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.ops import native


@pytest.fixture(scope="module")
def have_native():
    ok = native.available()
    if not ok:
        pytest.skip("no C++ toolchain: numpy fallback covered elsewhere")
    return ok


def _numpy_ref_gray(bgr):
    b, g, r = (bgr[..., i].astype(np.uint32) for i in range(3))
    return (((77 * r + 150 * g + 29 * b + 128) >> 8).astype(np.uint8)[..., None])


def test_builds_and_reports_available(have_native):
    assert native.load() is not None
    assert os.path.exists(native._SO)


def test_bgr_to_gray_matches_reference(have_native, rng):
    bgr = rng.integers(0, 255, (3, 32, 40, 3), np.uint8)
    np.testing.assert_array_equal(native.bgr_to_gray(bgr), _numpy_ref_gray(bgr))


def test_bgr_to_rgb(have_native, rng):
    bgr = rng.integers(0, 255, (8, 8, 3), np.uint8)
    np.testing.assert_array_equal(native.bgr_to_rgb(bgr), bgr[..., ::-1])


def test_pack_pairs(have_native, rng):
    frames = rng.integers(0, 255, (5, 16, 16, 1), np.uint8)
    a, b = native.pack_pairs(frames)
    np.testing.assert_array_equal(a, frames[:-1])
    np.testing.assert_array_equal(b, frames[1:])
    assert a.flags["C_CONTIGUOUS"] and b.flags["C_CONTIGUOUS"]


def test_pack_pairs_needs_two():
    with pytest.raises(ValueError):
        native.pack_pairs(np.zeros((1, 4, 4, 1), np.uint8))


def test_interleave(have_native, rng):
    p, k = 3, 2
    originals = rng.integers(0, 255, (p + 1, 8, 8, 3), np.uint8)
    mids = rng.integers(0, 255, (p, k, 8, 8, 3), np.uint8)
    out = native.interleave(originals, mids)
    assert out.shape[0] == p * (k + 1) + 1
    for i in range(p):
        np.testing.assert_array_equal(out[i * (k + 1)], originals[i])
        for j in range(k):
            np.testing.assert_array_equal(out[i * (k + 1) + 1 + j], mids[i, j])
    np.testing.assert_array_equal(out[-1], originals[-1])


def test_interleave_shape_validation():
    with pytest.raises(ValueError):
        native.interleave(np.zeros((3, 4, 4, 1), np.uint8),
                          np.zeros((3, 1, 4, 4, 1), np.uint8))


def test_numpy_fallback_matches_native(have_native, rng, monkeypatch):
    frames = rng.integers(0, 255, (4, 12, 12, 3), np.uint8)
    mids = rng.integers(0, 255, (3, 1, 12, 12, 3), np.uint8)
    fast = {"gray": native.bgr_to_gray(frames),
            "pack": native.pack_pairs(frames),
            "inter": native.interleave(frames, mids)}
    # force the fallback by hiding the lib
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_tried", True)
    slow = {"gray": native.bgr_to_gray(frames),
            "pack": native.pack_pairs(frames),
            "inter": native.interleave(frames, mids)}
    np.testing.assert_array_equal(fast["gray"], slow["gray"])
    np.testing.assert_array_equal(fast["pack"][0], slow["pack"][0])
    np.testing.assert_array_equal(fast["pack"][1], slow["pack"][1])
    np.testing.assert_array_equal(fast["inter"], slow["inter"])
