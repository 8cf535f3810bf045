"""Host/device image op tests: load/save round trips, normalize inverses."""

import numpy as np
import pytest

import jax.numpy as jnp

from ai_based_frame_interpolation_tpu.ops.image import (
    denormalize_to_uint8, load_image, normalize_uint8, preprocess_frames,
    save_image)


def test_normalize_denormalize_roundtrip(rng):
    u8 = rng.integers(0, 255, (2, 16, 16, 1), np.uint8)
    x = normalize_uint8(jnp.asarray(u8))
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0
    back = np.asarray(denormalize_to_uint8(x))
    np.testing.assert_array_equal(back, u8)


def test_denormalize_clamps():
    x = jnp.asarray([[[[-5.0]], [[5.0]]]])
    out = np.asarray(denormalize_to_uint8(x))
    assert out.min() == 0 and out.max() == 255


def test_save_load_roundtrip_gray(tmp_path, rng):
    img = rng.integers(0, 255, (20, 30, 1), np.uint8)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p, grayscale=True)
    np.testing.assert_array_equal(back, img)


def test_save_load_roundtrip_rgb(tmp_path, rng):
    img = rng.integers(0, 255, (20, 30, 3), np.uint8)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p, grayscale=False)
    np.testing.assert_array_equal(back, img)   # RGB<->BGR handled internally


def test_load_resizes(tmp_path, rng):
    img = rng.integers(0, 255, (20, 30, 1), np.uint8)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p, grayscale=True, size=(64, 48))
    assert back.shape == (64, 48, 1)


def test_load_missing_raises():
    with pytest.raises(FileNotFoundError):
        load_image("/nonexistent/image.png")


def test_preprocess_frames_device_resize(rng):
    u8 = rng.integers(0, 255, (1, 32, 32, 1), np.uint8)
    out = preprocess_frames(jnp.asarray(u8), out_hw=(16, 16))
    assert out.shape == (1, 16, 16, 1)
    assert out.dtype == jnp.bfloat16
