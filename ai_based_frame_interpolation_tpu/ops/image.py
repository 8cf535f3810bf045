"""Image pre/post-processing ops — the single home for normalize/denormalize.

The reference duplicates preprocess/postprocess 3-4x across files
(``model/inference.py:11-63``, ``model/evaluation.py:14-66``,
``model/evaluation_simple.py:19-37``) **and** trains on [0,1] while inferring
on [-1,1] (reference ``model/train.py:142-144`` vs ``model/inference.py:34-35``
— a latent train/test domain mismatch, SURVEY.md §8.4). This framework
unifies on **[-1,1]** everywhere; that deviation is deliberate and documented.

Device-side ops are jit-friendly (static shapes, fusable elementwise); host
helpers wrap OpenCV for decode/encode.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .resize import resize_bilinear


def normalize_uint8(x: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 [0,255] -> dtype [-1,1]. Fuses into downstream convs under jit."""
    return x.astype(dtype) * (2.0 / 255.0) - 1.0


def denormalize_to_uint8(x: jax.Array) -> jax.Array:
    """[-1,1] float -> uint8 [0,255] with clamp + round-half-away like
    ``np.uint8((x+1)/2*255)`` after clipping (reference ``model/inference.py:43-63``)."""
    y = (x.astype(jnp.float32) + 1.0) * 0.5
    y = jnp.clip(y, 0.0, 1.0) * 255.0
    return jnp.round(y).astype(jnp.uint8)


def preprocess_frames(frames_u8: jax.Array, out_hw: Optional[Tuple[int, int]] = None,
                      dtype=jnp.bfloat16) -> jax.Array:
    """Device-side preprocess: uint8 NHWC -> normalized, optionally resized.

    The TPU-native replacement for the reference's host-side
    cv2 imread/resize/scale chain (``model/inference.py:11-41``): frames are
    shipped to HBM as uint8 (4x less PCIe/DMA traffic than f32) and the
    normalize (+ resize) runs on device where XLA fuses it into the first conv.
    """
    x = normalize_uint8(frames_u8, dtype=jnp.float32)
    if out_hw is not None and out_hw != x.shape[-3:-1]:
        x = resize_bilinear(x, out_hw, align_corners=False)
    return x.astype(dtype)


# ---------------------------------------------------------------------------
# Host-side helpers (OpenCV); used by CLI / data loader, never inside jit.
# ---------------------------------------------------------------------------

def load_image(path: str, grayscale: bool = True,
               size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """Read an image as HWC uint8 (C=1 grayscale or C=3 RGB), optionally
    resized with OpenCV area/linear like the reference
    (``model/inference.py:11-41``)."""
    import cv2

    flag = cv2.IMREAD_GRAYSCALE if grayscale else cv2.IMREAD_COLOR
    img = cv2.imread(path, flag)
    if img is None:
        raise FileNotFoundError(f"could not read image: {path}")
    if size is not None and (img.shape[0], img.shape[1]) != size:
        img = cv2.resize(img, (size[1], size[0]), interpolation=cv2.INTER_LINEAR)
    if img.ndim == 2:
        img = img[:, :, None]
    elif not grayscale:
        img = img[:, :, ::-1].copy()  # BGR -> RGB
    return img


def save_image(path: str, img: np.ndarray) -> None:
    """Write HWC uint8 (1 or 3 channels, RGB) to disk."""
    import cv2

    img = np.asarray(img)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[:, :, 0]
    elif img.ndim == 3 and img.shape[-1] == 3:
        img = img[:, :, ::-1]  # RGB -> BGR
    if not cv2.imwrite(path, img):
        raise IOError(f"could not write image: {path}")
