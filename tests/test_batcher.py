"""Continuous request batching (serve/batcher.py).

The reference serves requests strictly one-at-a-time through a subprocess
(reference ``api/app.py:65-119``); here concurrent requests are fused into
batched device dispatches. A controllable fake engine makes the coalescing
behavior deterministic; one integration test runs the real tiny engine.
"""

import threading
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.serve.batcher import DynamicBatcher


class FakeEngine:
    """Engine-shaped test double: midpoint = rounded mean of the two frames.

    ``hold`` (when set) blocks the first dispatch until released, so tests
    can deterministically pile requests up behind a busy device.
    """

    def __init__(self, hold: bool = False):
        self.variables = None
        self.calls = []            # list of (num, batch) actually dispatched
        self.release = threading.Event()
        self.entered = threading.Event()
        self.hold = hold

    def _put(self, x):
        return x

    def _pair_fn(self, n_out, depth):
        def fn(variables, f1, f2):
            self.entered.set()
            if self.hold and not self.calls:
                assert self.release.wait(5.0), "test forgot to release"
            self.calls.append((n_out, f1.shape[0]))
            mid = ((f1.astype(np.int32) + f2.astype(np.int32)) // 2
                   ).astype(np.uint8)
            return np.repeat(mid[:, None], n_out, axis=1)
        return fn


def frames(seed, n=1, h=8, w=8):
    rng = np.random.default_rng(seed)
    out = rng.integers(0, 255, (n, h, w, 1), np.uint8)
    return out[0] if n == 1 else out


def test_single_request_no_added_latency_path():
    eng = FakeEngine()
    b = DynamicBatcher(eng)
    f1, f2 = frames(0), frames(1)
    mids = b.generate_intermediate_frames(f1, f2, 3)
    assert len(mids) == 3
    expected = ((f1.astype(np.int32) + f2.astype(np.int32)) // 2)
    np.testing.assert_array_equal(mids[0], expected.astype(np.uint8))
    assert eng.calls == [(3, 1)]           # lone request -> batch of 1
    assert b.stats["dispatches"] == 1


def test_requests_behind_busy_device_coalesce():
    eng = FakeEngine(hold=True)
    b = DynamicBatcher(eng, max_batch=8)
    results = {}

    def one(i):
        results[i] = b.generate_intermediate_frames(frames(2 * i),
                                                    frames(2 * i + 1), 1)

    with ThreadPoolExecutor(5) as pool:
        first = pool.submit(one, 0)
        assert eng.entered.wait(5.0)       # dispatch 1 in flight (held)
        rest = [pool.submit(one, i) for i in range(1, 5)]
        time.sleep(0.2)                    # the 4 followers enqueue
        eng.release.set()
        first.result(timeout=10)
        [f.result(timeout=10) for f in rest]

    # one held dispatch of 1, then ONE fused dispatch of the 4 followers
    assert eng.calls[0] == (1, 1)
    assert [c for _, c in eng.calls[1:]] == [4]
    for i in range(5):
        expected = ((frames(2 * i).astype(np.int32) +
                     frames(2 * i + 1).astype(np.int32)) // 2).astype(np.uint8)
        np.testing.assert_array_equal(results[i][0], expected)
    assert b.stats["max_batch_seen"] == 4


def test_bucket_padding_bounds_compile_shapes():
    eng = FakeEngine(hold=True)
    b = DynamicBatcher(eng, max_batch=8, buckets=(1, 2, 4, 8))

    with ThreadPoolExecutor(4) as pool:
        first = pool.submit(b.generate_intermediate_frames,
                            frames(0), frames(1), 1)
        assert eng.entered.wait(5.0)
        rest = [pool.submit(b.generate_intermediate_frames,
                            frames(i), frames(i + 10), 1)
                for i in range(2, 5)]      # 3 followers -> padded to 4
        time.sleep(0.2)
        eng.release.set()
        first.result(timeout=10)
        [f.result(timeout=10) for f in rest]

    assert eng.calls[1] == (1, 4)          # 3 real + 1 padding lane
    assert b.stats["batched_requests"] == 4  # padding lanes aren't requests


def test_different_num_dispatch_separately():
    eng = FakeEngine(hold=True)
    b = DynamicBatcher(eng)

    with ThreadPoolExecutor(3) as pool:
        first = pool.submit(b.generate_intermediate_frames,
                            frames(0), frames(1), 1)
        assert eng.entered.wait(5.0)
        f_n3 = pool.submit(b.generate_intermediate_frames,
                           frames(2), frames(3), 3)
        f_n1 = pool.submit(b.generate_intermediate_frames,
                           frames(4), frames(5), 1)
        time.sleep(0.2)
        eng.release.set()
        first.result(timeout=10)
        assert len(f_n3.result(timeout=10)) == 3
        assert len(f_n1.result(timeout=10)) == 1

    # the num=3 and num=1 followers must not share a dispatch
    nums = [n for n, _ in eng.calls]
    assert sorted(nums) == [1, 1, 3]
    assert all(c == 1 for _, c in eng.calls)


def test_device_error_reaches_every_waiter_and_batcher_survives():
    class Exploding(FakeEngine):
        def _pair_fn(self, n_out, depth):
            inner = super()._pair_fn(n_out, depth)

            def fn(variables, f1, f2):
                inner(variables, f1, f2)
                if len(self.calls) <= 2:
                    raise RuntimeError("device on fire")
                mid = ((f1.astype(np.int32) + f2.astype(np.int32)) // 2
                       ).astype(np.uint8)
                return np.repeat(mid[:, None], n_out, axis=1)
            return fn

    eng = Exploding(hold=True)
    b = DynamicBatcher(eng)
    with ThreadPoolExecutor(3) as pool:
        first = pool.submit(b.generate_intermediate_frames,
                            frames(0), frames(1), 1)
        assert eng.entered.wait(5.0)
        followers = [pool.submit(b.generate_intermediate_frames,
                                 frames(i), frames(i + 1), 1)
                     for i in (2, 4)]
        time.sleep(0.2)
        eng.release.set()
        with pytest.raises(RuntimeError, match="on fire"):
            first.result(timeout=10)
        for f in followers:
            with pytest.raises(RuntimeError, match="on fire"):
                f.result(timeout=10)
    # a later lone request succeeds (calls > 2 -> no raise)
    mids = b.generate_intermediate_frames(frames(8), frames(9), 1)
    assert len(mids) == 1


def test_interpolate_pair_is_num1():
    eng = FakeEngine()
    b = DynamicBatcher(eng)
    f1, f2 = frames(0), frames(1)
    mid = b.interpolate_pair(f1, f2)
    expected = ((f1.astype(np.int32) + f2.astype(np.int32)) // 2)
    np.testing.assert_array_equal(mid, expected.astype(np.uint8))


def test_real_engine_batched_results_match_serial():
    """Integration: batched dispatch through the real (tiny) engine produces
    the same frames as serial per-request calls — padding lanes and bucket
    shapes included."""
    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    engine = InterpolationEngine.random_init(ModelConfig(base_width=4))
    b = DynamicBatcher(engine, max_batch=8)
    pairs = [(frames(i, h=32, w=32), frames(i + 50, h=32, w=32))
             for i in range(3)]
    serial = [engine.generate_intermediate_frames(f1, f2, 1)[0]
              for f1, f2 in pairs]

    got = {}

    def one(i):
        f1, f2 = pairs[i]
        got[i] = b.generate_intermediate_frames(f1, f2, 1)[0]

    with ThreadPoolExecutor(3) as pool:
        list(pool.map(one, range(3)))

    # uint8 outputs of the same compiled program are bit-exact per batch
    # shape; across batch shapes bf16 rounding can differ by 1 (CLAUDE.md)
    for i in range(3):
        np.testing.assert_allclose(got[i].astype(np.int32),
                                   serial[i].astype(np.int32), atol=1)
