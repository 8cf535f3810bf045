"""ctypes loader for the native fastimage kernels, with numpy fallbacks.

Build model: ``fastimage.cpp`` compiles to ``_fastimage.so`` next to this
file on first use (g++ -O3 -march=native, ~1 s, cached by mtime); the
framework works identically — slower — when no C++ toolchain exists.
``FI_TPU_NO_NATIVE=1`` forces the numpy path (used by tests to compare both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fastimage.cpp")
_SO = os.path.join(_HERE, "_fastimage.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it if needed; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("FI_TPU_NO_NATIVE"):
            return None
        stale = (not os.path.exists(_SO) or
                 os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.fastimage_abi_version.restype = ctypes.c_int
            if lib.fastimage_abi_version() != 1:
                return None
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64 = ctypes.c_int64
            lib.bgr_to_gray_u8.argtypes = [u8p, u8p, i64]
            lib.bgr_to_rgb_u8.argtypes = [u8p, u8p, i64]
            lib.pack_pairs_u8.argtypes = [u8p, u8p, u8p, i64, i64]
            lib.interleave_u8.argtypes = [u8p, u8p, u8p, i64, i64, i64]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def bgr_to_gray(bgr: np.ndarray) -> np.ndarray:
    """[..., H, W, 3] uint8 BGR -> [..., H, W, 1] uint8 BT.601 luma."""
    bgr = np.ascontiguousarray(bgr, np.uint8)
    lib = load()
    if lib is None:
        b = bgr[..., 0].astype(np.uint32)
        g = bgr[..., 1].astype(np.uint32)
        r = bgr[..., 2].astype(np.uint32)
        return (((77 * r + 150 * g + 29 * b + 128) >> 8)
                .astype(np.uint8)[..., None])
    out = np.empty(bgr.shape[:-1], np.uint8)
    lib.bgr_to_gray_u8(_ptr(bgr), _ptr(out), out.size)
    return out[..., None]


def bgr_to_rgb(bgr: np.ndarray) -> np.ndarray:
    bgr = np.ascontiguousarray(bgr, np.uint8)
    lib = load()
    if lib is None:
        return bgr[..., ::-1].copy()
    out = np.empty_like(bgr)
    lib.bgr_to_rgb_u8(_ptr(bgr), _ptr(out), bgr.size // 3)
    return out


def pack_pairs(frames: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N, H, W, C] u8 -> ([N-1, ...] f_i, [N-1, ...] f_{i+1}), contiguous."""
    frames = np.ascontiguousarray(frames, np.uint8)
    n = frames.shape[0]
    if n < 2:
        raise ValueError("need at least 2 frames")
    lib = load()
    if lib is None:
        return frames[:-1].copy(), frames[1:].copy()
    fb = int(np.prod(frames.shape[1:]))
    out1 = np.empty((n - 1, *frames.shape[1:]), np.uint8)
    out2 = np.empty_like(out1)
    lib.pack_pairs_u8(_ptr(frames), _ptr(out1), _ptr(out2), n, fb)
    return out1, out2


def interleave(originals: np.ndarray, mids: np.ndarray) -> np.ndarray:
    """originals [P+1, H, W, C] + mids [P, K, H, W, C] -> [P*(K+1)+1, ...]
    in playback order (the 2x/4x output-stream assembly)."""
    originals = np.ascontiguousarray(originals, np.uint8)
    mids = np.ascontiguousarray(mids, np.uint8)
    p, k = mids.shape[0], mids.shape[1]
    if originals.shape[0] != p + 1:
        raise ValueError(f"need {p + 1} originals for {p} pairs, "
                         f"got {originals.shape[0]}")
    if originals.shape[1:] != mids.shape[2:]:
        raise ValueError("frame shape mismatch")
    out = np.empty((p * (k + 1) + 1, *originals.shape[1:]), np.uint8)
    lib = load()
    if lib is None:
        for i in range(p):
            out[i * (k + 1)] = originals[i]
            out[i * (k + 1) + 1:(i + 1) * (k + 1)] = mids[i]
        out[-1] = originals[-1]
        return out
    fb = int(np.prod(originals.shape[1:]))
    lib.interleave_u8(_ptr(originals), _ptr(mids), _ptr(out), p, k, fb)
    return out
