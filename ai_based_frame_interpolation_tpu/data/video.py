"""Streaming video decode/encode (host side) for the video pipeline.

The reference assembles frame lists in memory and writes them with
``imageio.mimsave`` (``model/inference.py:176-202``); its advertised
video-file interpolation path does not exist (``main.py:118-129`` imports a
nonexistent class — SURVEY.md §8.2). Here video IO is a streaming abstraction:
constant host memory regardless of clip length, decoupled from the device
loop so decode/encode overlap TPU compute.

OpenCV is the backend (this image ships no ffmpeg binary / imageio-ffmpeg;
cv2's bundled mp4v encoder is the working MP4 path).
"""

from __future__ import annotations

import os
import threading
import queue
from typing import Iterator, Optional

import numpy as np


class VideoReader:
    """Iterate RGB (or grayscale) HWC uint8 frames from a video file."""

    def __init__(self, path: str, grayscale: bool = False):
        import cv2

        if not os.path.exists(path):
            raise FileNotFoundError(path)
        self._cv2 = cv2
        self.cap = cv2.VideoCapture(path)
        if not self.cap.isOpened():
            raise IOError(f"could not open video: {path}")
        self.fps = float(self.cap.get(cv2.CAP_PROP_FPS)) or 30.0
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.frame_count = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.grayscale = grayscale

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            if self.grayscale:
                yield self._cv2.cvtColor(frame, self._cv2.COLOR_BGR2GRAY)[..., None]
            else:
                yield frame[:, :, ::-1]  # BGR -> RGB
        self.cap.release()

    def close(self):
        self.cap.release()


class AsyncVideoReader(VideoReader):
    """VideoReader with a background decode-ahead thread.

    The synchronous reader decodes inside the consumer loop, serializing
    decode with dispatch/assembly; this variant keeps ``max_queue`` frames
    decoded ahead so decode, device compute, and encode all overlap — on a
    host-bound machine end-to-end throughput becomes max(decode, encode)
    instead of their sum.
    """

    def __init__(self, path: str, grayscale: bool = False,
                 max_queue: int = 32):
        super().__init__(path, grayscale=grayscale)
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(max_queue)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._produce, daemon=True)
        self._thread.start()

    def _produce(self):
        try:
            for frame in VideoReader.__iter__(self):
                self._q.put(frame)
        except BaseException as e:
            self._err = e
        finally:
            self._q.put(None)

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            frame = self._q.get()
            if frame is None:
                break
            yield frame
        self._thread.join()
        if self._err is not None:
            raise self._err


class VideoWriter:
    """Write RGB/grayscale HWC uint8 frames to an MP4, streaming."""

    def __init__(self, path: str, fps: float = 30.0, codec: str = "mp4v"):
        self.path = path
        self.fps = fps
        self.codec = codec
        self._writer = None
        self.frames_written = 0

    def _open(self, h: int, w: int, color: bool):
        import cv2

        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        fourcc = cv2.VideoWriter_fourcc(*self.codec)
        # grayscale streams encode directly (isColor=False) — skips a
        # per-frame GRAY->BGR conversion, which matters on small hosts
        self._writer = cv2.VideoWriter(self.path, fourcc, self.fps, (w, h),
                                       isColor=color)
        self._color = color
        if not self._writer.isOpened():
            raise IOError(f"could not open video writer: {self.path}")

    def write(self, frame: np.ndarray):
        import cv2

        frame = np.asarray(frame)
        if frame.ndim == 2:
            frame = frame[..., None]
        h, w = frame.shape[:2]
        if self._writer is None:
            self._open(h, w, color=frame.shape[-1] != 1)
        if frame.shape[-1] == 1:
            if self._color:   # stream switched? keep the writer consistent
                out = cv2.cvtColor(frame[..., 0], cv2.COLOR_GRAY2BGR)
            else:
                out = frame[..., 0]
        else:
            out = frame[:, :, ::-1]  # RGB -> BGR
        self._writer.write(np.ascontiguousarray(out))
        self.frames_written += 1

    def close(self):
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AsyncVideoWriter(VideoWriter):
    """VideoWriter with a background encode thread.

    The device loop hands frames off and returns immediately, so MP4 encode
    (CPU) overlaps TPU compute — this is where the fps north-star metric
    lives (SURVEY.md §7 "hard parts": host encode can starve the TPU).
    """

    def __init__(self, path: str, fps: float = 30.0, codec: str = "mp4v",
                 max_queue: int = 64):
        super().__init__(path, fps, codec)
        self._q: "queue.Queue[Optional[np.ndarray]]" = queue.Queue(max_queue)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            frame = self._q.get()
            if frame is None:
                return
            try:
                super(AsyncVideoWriter, self).write(frame)
            except BaseException as e:  # surfaced on next write()/close()
                self._err = e
                return

    def write(self, frame: np.ndarray):
        if self._err is not None:
            raise self._err
        self._q.put(np.asarray(frame))

    def close(self):
        self._q.put(None)
        self._thread.join()
        super().close()
        if self._err is not None:
            raise self._err
