"""Optical-flow interpolation baseline (host-side, OpenCV Farneback).

Re-implements the reference's second evaluation baseline
(``model/evaluation_simple.py:76-101`` / ``model/evaluation.py:142-192``,
duplicated 4x there): dense Farneback flow f1->f2 with the reference's exact
parameters, half-flow warp of f1 via ``cv2.remap`` with border replication.

This is a *comparison baseline*, not a TPU path — it stays on host behind a
small interface so the eval harness can treat all methods uniformly.
"""

from __future__ import annotations

import numpy as np

FARNEBACK_PARAMS = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                        poly_n=5, poly_sigma=1.1, flags=0)


def farneback_midpoint(f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
    """Midpoint estimate by warping f1 halfway along the dense flow f1->f2.

    Inputs/outputs are HWC uint8 (C=1 grayscale; RGB inputs are flowed on
    luma and each channel warped with the same field).
    """
    import cv2

    f1 = np.asarray(f1)
    f2 = np.asarray(f2)
    g1 = f1[..., 0] if f1.shape[-1] == 1 else cv2.cvtColor(f1, cv2.COLOR_RGB2GRAY)
    g2 = f2[..., 0] if f2.shape[-1] == 1 else cv2.cvtColor(f2, cv2.COLOR_RGB2GRAY)
    flow = cv2.calcOpticalFlowFarneback(g1, g2, None, **FARNEBACK_PARAMS)
    h, w = g1.shape
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    # Documented deviation from the reference: ``evaluation_simple.py:90-91``
    # samples f1 at ``x + 0.5*flow`` which moves content *against* the motion
    # (measured 12.97 dB vs 40.51 dB for the correct sign on a pure-translation
    # fixture). The correct half-step backward warp samples at ``x - 0.5*flow``.
    map_x = (gx - 0.5 * flow[..., 0]).astype(np.float32)
    map_y = (gy - 0.5 * flow[..., 1]).astype(np.float32)
    if f1.shape[-1] == 1:
        mid = cv2.remap(g1, map_x, map_y, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REPLICATE)[..., None]
    else:
        mid = cv2.remap(f1, map_x, map_y, cv2.INTER_LINEAR,
                        borderMode=cv2.BORDER_REPLICATE)
    return mid


def linear_midpoint(f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
    """Pixel-average baseline (reference ``evaluation_simple.py:71-74``)."""
    return ((f1.astype(np.float32) + f2.astype(np.float32)) / 2.0).astype(np.uint8)
