"""Deterministic synthetic fixtures — the moving-circle sequence.

The reference's de-facto test asset is a 5-frame sequence of a white circle
translating left to right with additive noise, written by
``demo_simple.py:17-40,203-224`` to ``test_data/sample_video/``. This module
regenerates an equivalent fixture deterministically (seeded numpy; no files
required) and can also write it to disk in the reference's directory layout
(``<root>/<video>/frame_XXX.png``) for dataset / CLI / eval tests.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np


def moving_circle_frames(num_frames: int = 5, height: int = 256,
                         width: int = 256, radius: int = 30,
                         step: int = 40, noise: int = 10,
                         channels: int = 1, seed: int = 0) -> np.ndarray:
    """[T, H, W, C] uint8 frames of a bright disc translating left->right."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width]
    frames = []
    for t in range(num_frames):
        cx = radius + 20 + t * step
        cy = height // 2
        disc = ((xx - cx) ** 2 + (yy - cy) ** 2) <= radius ** 2
        img = np.full((height, width), 40, np.float32)
        img[disc] = 230.0
        img = img + rng.uniform(-noise, noise, img.shape)
        frame = np.clip(img, 0, 255).astype(np.uint8)[..., None]
        if channels == 3:
            frame = np.repeat(frame, 3, axis=-1)
        frames.append(frame)
    return np.stack(frames)


def write_fixture_tree(root: str, num_videos: int = 1, num_frames: int = 5,
                       height: int = 256, width: int = 256,
                       channels: int = 1, seed: int = 0) -> List[str]:
    """Write ``<root>/video_XX/frame_XXX.png`` trees; returns video dirs."""
    import cv2

    dirs = []
    for v in range(num_videos):
        vdir = os.path.join(root, f"video_{v:02d}")
        os.makedirs(vdir, exist_ok=True)
        frames = moving_circle_frames(num_frames, height, width,
                                      channels=channels, seed=seed + v,
                                      step=max(8, 40 - 6 * v))
        for i, f in enumerate(frames):
            img = f[..., 0] if f.shape[-1] == 1 else f[..., ::-1]
            cv2.imwrite(os.path.join(vdir, f"frame_{i:03d}.png"), img)
        dirs.append(vdir)
    return dirs


def moving_scene_frames(num_frames: int = 16, height: int = 256,
                        width: int = 256, channels: int = 1,
                        num_sprites: int = 4, max_speed: float = 6.0,
                        noise: float = 4.0, seed: int = 0,
                        motion: str = "linear",
                        flicker: float = 0.0) -> np.ndarray:
    """[T, H, W, C] uint8 frames of a procedurally rich scene.

    The moving-circle fixture (reference ``demo_simple.py:17-40``) has one
    motion vector and a flat background — a model can ace it without learning
    general interpolation. This generator produces diverse, still fully
    deterministic scenes for meaningful training:

    - a band-limited **textured background** that pans with a global
      sub-pixel velocity (camera motion),
    - ``num_sprites`` anti-aliased sprites (discs / soft gaussian blobs /
      rounded rectangles) with independent velocities, sizes, intensities
      and optional size change over time (approach/recede motion),
    - a gentle global brightness ramp (photometric variation),
    - additive sensor noise.

    Every frame is RENDERED at its own time t, so the ground-truth middle of
    frames (t, t+2) is genuinely frame t+1 regardless of the motion model —
    the dataset contract of the triplet loader (reference
    ``model/train.py:96-118``) holds for curved trajectories too.

    ``motion="linear"`` (default): constant velocities — the tier every
    recorded quality number uses. ``motion="hard"``: camera rotation + zoom
    composed with the pan, sprite acceleration, and orbiting sprites —
    curved trajectories and natural occlusions that a linear blend (and a
    single symmetric field) cannot model; the tier that differentiates
    ``--flow-bidir`` / ``--flow-cascade``.

    ``flicker`` > 0 adds a per-frame multiplicative exposure modulation
    ``1 + flicker*sin(2*pi*t/period + phase)`` (random period 2.5-5
    frames, random phase) on top of the gentle linear ramp — fluorescent-
    light / auto-exposure flicker. Because the period is a few frames,
    the midpoint's brightness is NOT the average of its neighbours'; the
    frame-rendered-at-its-own-t contract still holds (the ground-truth
    mid frame carries its own exposure). This is the motivating case of
    the census loss (illumination-robust structure matching,
    ``ops/census.py``) — the round-4 demotion tested it on illumination-
    stable content only (round-4 VERDICT task 8).
    """
    import cv2

    if motion not in ("linear", "hard"):
        raise ValueError(f"motion must be 'linear' or 'hard', got {motion!r}")
    rng = np.random.default_rng(seed)
    c = 3 if channels == 3 else 1

    # --- background: low-frequency noise canvas, panned by a global velocity
    pan_v = rng.uniform(-max_speed / 2, max_speed / 2, size=2)
    # hard tier: slow camera rotation + zoom on top of the pan
    rot_v = rng.uniform(-1.5, 1.5) if motion == "hard" else 0.0   # deg/frame
    zoom_v = rng.uniform(-4e-3, 4e-3) if motion == "hard" else 0.0
    pad = int(np.ceil(max_speed / 2 * (num_frames + 1))) + 4
    if motion == "hard":
        # rotation/zoom sweep corners beyond the pan envelope
        diag = 0.5 * float(np.hypot(height, width))
        ang = abs(rot_v) * (num_frames - 1) * np.pi / 180.0
        pad += int(np.ceil(diag * (ang + abs(zoom_v) * (num_frames - 1)))) + 4
    ch_, cw_ = height + 2 * pad, width + 2 * pad
    grid = rng.uniform(30, 170, size=(ch_ // 32 + 2, cw_ // 32 + 2, c))
    canvas = cv2.resize(grid.astype(np.float32), (cw_, ch_),
                        interpolation=cv2.INTER_CUBIC)
    if c == 1 and canvas.ndim == 2:
        canvas = canvas[..., None]

    # --- sprites: kind, start position, velocity, size, size velocity, color
    sprites = []
    for _ in range(num_sprites):
        s = {
            "kind": rng.choice(["disc", "blob", "rect"]),
            "p0": rng.uniform([0, 0], [height, width]),
            "v": rng.uniform(-max_speed, max_speed, size=2),
            "r0": rng.uniform(5.0, max(6.0, min(height, width) / 5)),
            "rv": rng.uniform(-0.5, 0.5),
            "color": rng.uniform(60, 255, size=c),
            "a": np.zeros(2), "orbit_r": 0.0, "orbit_w": 0.0,
            "orbit_phi": 0.0,
        }
        if motion == "hard":
            # curved trajectories: acceleration for all, an orbital
            # component for roughly half the sprites
            s["a"] = rng.uniform(-max_speed / 8, max_speed / 8, size=2)
            if rng.uniform() < 0.5:
                s["orbit_r"] = rng.uniform(4.0, min(height, width) / 6)
                s["orbit_w"] = rng.uniform(-0.5, 0.5)       # rad/frame
                s["orbit_phi"] = rng.uniform(0, 2 * np.pi)
        sprites.append(s)
    ramp = rng.uniform(-0.3, 0.3)  # total brightness change over the clip
    flick_period = rng.uniform(2.5, 5.0)     # frames per flicker cycle
    flick_phase = rng.uniform(0, 2 * np.pi)

    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    frames = []
    for t in range(num_frames):
        # panned (and, hard tier, rotated/zoomed) background crop
        oy, ox = pad + pan_v[0] * t, pad + pan_v[1] * t
        if motion == "hard":
            # rotate/zoom about the visible-crop center, then pan
            mr = cv2.getRotationMatrix2D(
                (float(ox + width / 2), float(oy + height / 2)),
                rot_v * t, 1.0 + zoom_v * t)
            mr[0, 2] -= ox
            mr[1, 2] -= oy
            m = np.float32(mr)
        else:
            m = np.float32([[1, 0, -ox], [0, 1, -oy]])
        img = cv2.warpAffine(canvas, m, (width, height),
                             flags=cv2.INTER_LINEAR)
        if c == 1 and img.ndim == 2:
            img = img[..., None]
        img = img.copy()

        for s in sprites:
            cy, cx = (s["p0"] + s["v"] * t + 0.5 * s["a"] * t * t)
            if s["orbit_r"]:
                phi = s["orbit_phi"] + s["orbit_w"] * t
                cy, cx = (cy + s["orbit_r"] * np.sin(phi),
                          cx + s["orbit_r"] * np.cos(phi))
            r = max(3.0, s["r0"] + s["rv"] * t)
            d = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            if s["kind"] == "disc":
                alpha = np.clip(r - d, 0.0, 1.0)          # 1-px AA edge
            elif s["kind"] == "blob":
                alpha = np.exp(-0.5 * (d / (r / 2)) ** 2)
            else:  # rounded rect: L-inf distance with the same AA edge
                dd = np.maximum(np.abs(yy - cy), np.abs(xx - cx))
                alpha = np.clip(r - dd, 0.0, 1.0)
            img = img * (1 - alpha[..., None]) + s["color"] * alpha[..., None]

        gain = 1.0 + ramp * (t / max(1, num_frames - 1))
        if flicker:
            gain *= 1.0 + flicker * np.sin(
                2 * np.pi * t / flick_period + flick_phase)
        img = img * gain + rng.uniform(-noise, noise, img.shape)
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
    return np.stack(frames)


def write_scene_tree(root: str, num_videos: int = 8, num_frames: int = 16,
                     height: int = 256, width: int = 256,
                     channels: int = 1, seed: int = 0,
                     num_sprites: int = 4,
                     motion: str = "linear",
                     max_speed: float = 6.0,
                     flicker: float = 0.0) -> List[str]:
    """Write a training-scale tree of :func:`moving_scene_frames` clips in
    the reference's directory layout (``<root>/<video>/frame_XXX.png``).

    ``max_speed`` (px/frame) scales sprite velocities — the fast-motion
    tiers (>= ~16 px/frame) probe the shifts-warp displacement bound
    (``ModelConfig.max_flow``) by exceeding it at training time."""
    import cv2

    dirs = []
    for v in range(num_videos):
        vdir = os.path.join(root, f"scene_{v:03d}")
        os.makedirs(vdir, exist_ok=True)
        frames = moving_scene_frames(num_frames, height, width,
                                     channels=channels, seed=seed + 1000 * v,
                                     num_sprites=num_sprites, motion=motion,
                                     max_speed=max_speed, flicker=flicker)
        for i, f in enumerate(frames):
            img = f[..., 0] if f.shape[-1] == 1 else f[..., ::-1]
            cv2.imwrite(os.path.join(vdir, f"frame_{i:03d}.png"), img)
        dirs.append(vdir)
    return dirs


def write_fixture_video(path: str, num_frames: int = 30, height: int = 128,
                        width: int = 128, fps: float = 30.0,
                        seed: int = 0) -> str:
    """Write a small MP4 of the moving circle (for video-pipeline tests)."""
    from .video import VideoWriter

    frames = moving_circle_frames(num_frames, height, width, channels=3,
                                  step=max(1, width // (num_frames + 2)),
                                  seed=seed)
    with VideoWriter(path, fps=fps) as w:
        for f in frames:
            w.write(f)
    return path
