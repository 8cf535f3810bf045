"""Host input pipeline: threaded decode -> batched uint8 -> sharded device put.

TPU-native replacement for the reference's ``DataLoader(num_workers=4,
pin_memory=True)`` (``model/train.py:282-296``):

- decode/resize runs in a thread pool (cv2 releases the GIL in imread/resize);
- batches ship to device as **uint8** (4x less host->device traffic than f32;
  normalization fuses into the first conv on device, see ``ops/image.py``);
- each batch is placed with a ``NamedSharding`` splitting the batch axis
  across the mesh — one global array, XLA handles the rest;
- a background prefetch queue keeps ``prefetch`` batches in flight so the
  device never waits on the host (the v5e equivalent of pin_memory+async H2D).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Sequence

import jax
import numpy as np

from ..parallel.mesh import batch_sharding
from .triplets import Triplet, load_triplet_arrays


class TripletLoader:
    """Iterable over epochs of batched triplet arrays.

    Yields dicts ``{"f0": [B,H,W,C] u8, "f1": ..., "gt": ...}`` — numpy by
    default, or globally-sharded ``jax.Array``s when a mesh is given.
    """

    def __init__(self, triplets: Sequence[Triplet], batch_size: int,
                 height: int = 256, width: int = 256, grayscale: bool = True,
                 shuffle: bool = True, seed: int = 0, drop_remainder: bool = True,
                 num_workers: int = 4, mesh=None, prefetch: int = 2,
                 augment: bool = False):
        if not triplets:
            raise ValueError("no triplets to load")
        self.triplets = list(triplets)
        self.batch_size = batch_size
        self.height, self.width = height, width
        self.grayscale = grayscale
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        # 0 = synchronous decode in the iterator thread (still prefetched
        # one batch ahead by the producer thread); ThreadPoolExecutor
        # itself rejects max_workers=0.
        self.num_workers = max(1, num_workers)
        self.mesh = mesh
        self.prefetch = prefetch
        self.augment = augment
        self._sharding = batch_sharding(mesh) if mesh is not None else None
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.triplets)
        return n // self.batch_size if self.drop_remainder else -(-n // self.batch_size)

    def _order(self) -> np.ndarray:
        if not self.shuffle:
            return np.arange(len(self.triplets))
        rng = np.random.default_rng(self.seed + self._epoch)
        return rng.permutation(len(self.triplets))

    def _augment_triplet(self, f0, f1, gt, idx: int):
        """Label-consistent augmentation: horizontal/vertical flips apply to
        all three frames alike; swapping f0<->f1 leaves the midpoint target
        unchanged (time reversal). Deterministic per (seed, epoch, item)."""
        rng = np.random.default_rng([self.seed, self._epoch, idx])
        hflip, vflip, tswap = rng.random(3) < 0.5
        if hflip:
            f0, f1, gt = (np.flip(a, axis=1) for a in (f0, f1, gt))
        if vflip:
            f0, f1, gt = (np.flip(a, axis=0) for a in (f0, f1, gt))
        if tswap:
            f0, f1 = f1, f0
        return np.ascontiguousarray(f0), np.ascontiguousarray(f1), \
            np.ascontiguousarray(gt)

    def _load_batch(self, idxs: np.ndarray) -> dict:
        f0s, f1s, gts = [], [], []
        for i in idxs:
            try:
                f0, f1, gt = load_triplet_arrays(
                    self.triplets[i], self.height, self.width, self.grayscale)
            except Exception as e:
                # one corrupt file must not kill an epoch (same isolation
                # policy as the eval harness); keep the batch shape static
                # by repeating the previous good item when possible
                import sys

                print(f"warning: skipping triplet "
                      f"{self.triplets[i].paths()[0]}: {e}", file=sys.stderr)
                if not f0s:
                    continue
                f0, f1, gt = f0s[-1], f1s[-1], gts[-1]
            if self.augment:
                f0, f1, gt = self._augment_triplet(f0, f1, gt, int(i))
            f0s.append(f0); f1s.append(f1); gts.append(gt)
        if not f0s:
            raise IOError("every triplet in the batch failed to decode")
        while len(f0s) < len(idxs):   # keep the batch shape static for jit
            f0s.append(f0s[-1]); f1s.append(f1s[-1]); gts.append(gts[-1])
        batch = {"f0": np.stack(f0s), "f1": np.stack(f1s), "gt": np.stack(gts)}
        if self._sharding is not None:
            batch = {k: jax.device_put(v, self._sharding)
                     for k, v in batch.items()}
        return batch

    def __iter__(self) -> Iterator[dict]:
        order = self._order()
        self._epoch += 1
        nfull = len(order) // self.batch_size
        chunks = [order[b * self.batch_size:(b + 1) * self.batch_size]
                  for b in range(nfull)]
        if not self.drop_remainder and len(order) % self.batch_size:
            chunks.append(order[nfull * self.batch_size:])

        q: "queue.Queue" = queue.Queue(self.prefetch)
        err: List[BaseException] = []

        def producer():
            try:
                from collections import deque

                with ThreadPoolExecutor(self.num_workers) as pool:
                    # bounded in-flight decode: q.put blocks when the consumer
                    # lags, so at most prefetch+inflight batches exist at once
                    pending = deque()
                    max_inflight = max(self.prefetch, self.num_workers)
                    for c in chunks:
                        pending.append(pool.submit(self._load_batch, c))
                        if len(pending) >= max_inflight:
                            q.put(pending.popleft().result())
                    while pending:
                        q.put(pending.popleft().result())
            except BaseException as e:
                err.append(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        t.join()
        if err:
            raise err[0]
