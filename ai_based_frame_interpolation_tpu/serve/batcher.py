"""Dynamic request batching for the serving layer (continuous batching).

The reference serves one request at a time — a fresh subprocess per request
(reference ``api/app.py:65-119``) — so concurrency was never part of its
design. The TPU engine here is warm and *batched* (``engine._pair_fn``
consumes ``[B, H, W, C]``), and on TPU a batch of B midpoints costs far less
than B dispatches of 1: the MXU is utilization-bound at small batch and every
dispatch pays fixed host->device overhead. This module turns concurrent HTTP
requests into device batches.

Design (continuous batching, not fixed-window batching):

- Arriving requests enqueue and the first becomes the *dispatcher*; it takes
  every compatible pending request (same ``num_intermediate`` — batch shape
  and bisection depth must match under jit) up to ``max_batch`` and runs ONE
  batched device call.
- Requests that arrive while the device is busy simply accumulate; whichever
  thread's item is still pending when the device frees becomes the next
  dispatcher and takes the whole accumulated group. A lone request therefore
  pays ZERO added latency (no wait-window), and under load the batch size
  adapts to the arrival rate automatically.
- Batches are padded up to a small set of *bucket* sizes (1/2/4/8 by
  default) by repeating the last pair, so the jit cache stays bounded at
  ``len(buckets)`` shapes per distinct ``num`` instead of one per observed
  batch size. Padded lanes are computed and discarded (cheaper than a
  recompile).
- An optional ``window_ms`` adds a short straggler wait before dispatch for
  batch-throughput-over-latency deployments; the default is 0.

The batcher is transport-agnostic: the stdlib HTTP server and the optional
FastAPI app both route through it.
"""

from __future__ import annotations

import math
import threading
from typing import List, Optional, Sequence

import numpy as np


class _Item:
    __slots__ = ("f1", "f2", "num", "result", "error", "done")

    def __init__(self, f1: np.ndarray, f2: np.ndarray, num: int):
        self.f1 = f1
        self.f2 = f2
        self.num = num
        self.result: Optional[List[np.ndarray]] = None
        self.error: Optional[BaseException] = None
        self.done = False


class DynamicBatcher:
    """Coalesces concurrent midpoint requests into batched device calls.

    Parameters
    ----------
    engine : InterpolationEngine
        The warm engine; its ``_pair_fn`` handles ``[B, H, W, C]`` input.
    max_batch : int
        Upper bound on requests fused into one device call.
    buckets : sequence of int
        Batch sizes that may reach the device (ascending). Real batches are
        padded up to the next bucket; ``max_batch`` is clamped to the largest
        bucket.
    window_ms : float
        Optional straggler wait before each dispatch. 0 (default) =
        continuous batching only.
    """

    def __init__(self, engine, max_batch: int = 8,
                 buckets: Sequence[int] = (1, 2, 4, 8),
                 window_ms: float = 0.0):
        self.engine = engine
        self.buckets = tuple(sorted(buckets))
        self.max_batch = min(max_batch, self.buckets[-1])
        self.window_ms = window_ms
        self._cond = threading.Condition()
        self._pending: List[_Item] = []
        self._dispatching = False
        # observability (read by /health)
        self.dispatches = 0
        self.batched_requests = 0
        self.max_seen_batch = 0

    # -- public API --------------------------------------------------------

    def generate_intermediate_frames(self, f1: np.ndarray, f2: np.ndarray,
                                     num: int) -> List[np.ndarray]:
        """Batching-aware equivalent of
        ``engine.generate_intermediate_frames`` (same contract: ``num``
        in-between HWC uint8 frames, time order)."""
        if num < 1:
            raise ValueError("num must be >= 1")
        item = _Item(f1, f2, num)
        with self._cond:
            self._pending.append(item)
            while not item.done:
                if not self._dispatching and not item.done:
                    self._dispatch_locked(item)
                else:
                    self._cond.wait(timeout=0.1)
        if item.error is not None:
            raise item.error
        assert item.result is not None
        return item.result

    def interpolate_pair(self, f1: np.ndarray, f2: np.ndarray) -> np.ndarray:
        """Batching-aware midpoint (``num=1``)."""
        return self.generate_intermediate_frames(f1, f2, 1)[0]

    # -- internals ---------------------------------------------------------

    def _dispatch_locked(self, leader: _Item) -> None:
        """Called with the lock held and ``leader`` pending: become the
        dispatcher, run one batched device call, publish results."""
        self._dispatching = True
        if self.window_ms > 0:
            # optional straggler window; lock released while sleeping
            self._cond.wait(timeout=self.window_ms / 1e3)
        group = [it for it in self._pending
                 if it.num == leader.num][:self.max_batch]
        if leader not in group:        # another dispatcher already served us
            self._dispatching = False  # (possible only with window_ms > 0)
            self._cond.notify_all()
            return
        for it in group:
            self._pending.remove(it)
        self._cond.release()
        try:
            self._run_batch(group)
        finally:
            self._cond.acquire()
            self._dispatching = False
            for it in group:
                it.done = True
            self._cond.notify_all()

    def _run_batch(self, group: List[_Item]) -> None:
        num = group[0].num
        n = len(group)
        padded = next(b for b in self.buckets if b >= n)
        f1 = np.stack([it.f1 for it in group] +
                      [group[-1].f1] * (padded - n))
        f2 = np.stack([it.f2 for it in group] +
                      [group[-1].f2] * (padded - n))
        try:
            depth = max(1, math.ceil(math.log2(num + 1)))
            out = np.asarray(self.engine._pair_fn(num, depth)(
                self.engine.variables, self.engine._put(f1),
                self.engine._put(f2)))
            for b, it in enumerate(group):
                it.result = [out[b, i] for i in range(num)]
        except BaseException as e:  # noqa: BLE001 — delivered to every waiter
            for it in group:
                it.error = e
        self.dispatches += 1
        self.batched_requests += n
        self.max_seen_batch = max(self.max_seen_batch, n)

    @property
    def stats(self) -> dict:
        return {"dispatches": self.dispatches,
                "batched_requests": self.batched_requests,
                "max_batch_seen": self.max_seen_batch,
                "avg_batch": round(self.batched_requests /
                                   self.dispatches, 2)
                if self.dispatches else None}
