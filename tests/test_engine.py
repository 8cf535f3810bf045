"""Inference-engine tests: bisection semantics, batching, streaming video."""

import math
import os

import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.data.synthetic import (
    moving_circle_frames, write_fixture_video)
from ai_based_frame_interpolation_tpu.data.video import VideoReader
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine

TINY = ModelConfig(base_width=4)


@pytest.fixture(scope="module")
def engine():
    return InterpolationEngine.random_init(TINY, seed=0)


@pytest.fixture(scope="module")
def rgb_engine():
    return InterpolationEngine.random_init(
        ModelConfig(base_width=4, channels=3), seed=0)


def test_interpolate_pair_shape(engine, tiny_frames):
    f1, f2 = tiny_frames
    mid = engine.interpolate_pair(f1, f2)
    assert mid.shape == f1.shape and mid.dtype == np.uint8


def test_pair_non_multiple_of_16(engine):
    f1 = np.zeros((50, 70, 1), np.uint8)
    mid = engine.interpolate_pair(f1, f1)
    assert mid.shape == (50, 70, 1)


def test_batch_matches_single(engine, tiny_frames):
    f1, f2 = tiny_frames
    batch = engine.interpolate_batch(np.stack([f1, f1]), np.stack([f2, f2]))
    single = engine.interpolate_pair(f1, f2)
    # BN uses running stats so results are batch-size independent up to
    # bf16 rounding (different XLA layouts per batch shape -> uint8 +-1)
    np.testing.assert_allclose(batch[0].astype(int), single.astype(int), atol=1)
    np.testing.assert_allclose(batch[1].astype(int), single.astype(int), atol=1)


def test_chunked_dispatch_matches_monolithic(engine, tiny_frames):
    # max_dispatch_batch splits a big batch into microbatch dispatches of
    # one compiled program (for configs whose graph only compiles at small
    # batches, e.g. RGB flow 1080p — docs/STATUS.md). Same math; uneven
    # tail chunk allowed.
    f1, f2 = tiny_frames
    b1 = np.stack([f1, f2, f1, f2, f1])
    b2 = np.stack([f2, f1, f2, f1, f2])
    whole = engine.interpolate_batch(b1, b2)
    try:
        engine.max_dispatch_batch = 2
        chunked = engine.interpolate_batch(b1, b2)
    finally:
        engine.max_dispatch_batch = None
    np.testing.assert_allclose(chunked.astype(int), whole.astype(int),
                               atol=1)


def test_chunked_dispatch_flow_family(tiny_frames):
    f1, f2 = tiny_frames
    eng = InterpolationEngine.random_init(
        ModelConfig(arch="flow", base_width=4, max_flow=8), seed=0)
    b1 = np.stack([f1, f2, f1, f2])
    b2 = np.stack([f2, f1, f2, f1])
    whole = eng._pair_fn(3, 2)(eng.variables, b1, b2)
    eng.max_dispatch_batch = 2
    chunked = eng._pair_fn(3, 2)(eng.variables, b1, b2)
    assert chunked.shape == whole.shape
    np.testing.assert_allclose(np.asarray(chunked).astype(int),
                               np.asarray(whole).astype(int), atol=1)


def test_generate_intermediates_are_distinct(engine, tiny_frames):
    # the reference emitted N copies of the same midpoint
    # (model/inference.py:124-149); bisection must give distinct frames
    f1, f2 = tiny_frames
    frames = engine.generate_intermediate_frames(f1, f2, 3)
    assert len(frames) == 3
    assert not np.array_equal(frames[0], frames[1])
    assert not np.array_equal(frames[1], frames[2])
    # middle of 3 equals the plain midpoint (up to uint8 rounding across
    # the two differently-fused compiled programs)
    np.testing.assert_allclose(frames[1].astype(int),
                               engine.interpolate_pair(f1, f2).astype(int),
                               atol=1)


@pytest.mark.parametrize("num", [1, 2, 5])
def test_generate_intermediates_counts(engine, tiny_frames, num):
    f1, f2 = tiny_frames
    assert len(engine.generate_intermediate_frames(f1, f2, num)) == num


def test_video_frames_2x_structure(engine):
    frames = list(moving_circle_frames(5, 32, 32))
    out = list(engine.interpolate_video_frames(iter(frames), factor=2,
                                               batch_pairs=2))
    # 5 in -> 4 pairs -> 5 + 4 = 9 out; originals at even indices
    assert len(out) == 9
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(out[2 * i], f)


def test_video_frames_4x_structure(engine):
    frames = list(moving_circle_frames(3, 32, 32))
    out = list(engine.interpolate_video_frames(iter(frames), factor=4,
                                               batch_pairs=8))
    assert len(out) == 3 + 2 * 3          # 2 pairs x 3 intermediates
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[4], frames[1])
    np.testing.assert_array_equal(out[8], frames[2])


def test_video_frames_batch_boundary_consistency(engine):
    # same stream, different batch_pairs -> identical output
    frames = list(moving_circle_frames(6, 32, 32))
    a = list(engine.interpolate_video_frames(iter(frames), 2, batch_pairs=2))
    b = list(engine.interpolate_video_frames(iter(frames), 2, batch_pairs=5))
    assert len(a) == len(b)
    for i, (x, y) in enumerate(zip(a, b)):
        if i % 2 == 0:        # originals pass through untouched -> exact
            np.testing.assert_array_equal(x, y)
        else:                 # interpolated: +-1 across batch shapes
            np.testing.assert_allclose(x.astype(int), y.astype(int), atol=1)


def test_video_factor_validation(engine):
    with pytest.raises(ValueError):
        list(engine.interpolate_video_frames(iter([]), factor=1))
    with pytest.raises(ValueError):
        engine.generate_intermediate_frames(
            np.zeros((32, 32, 1), np.uint8), np.zeros((32, 32, 1), np.uint8), 0)


def test_video_frames_non_power_of_two_factor(engine):
    """factor=3 is accepted everywhere now (exact for flow/time-conditioned
    models, nearest-dyadic for bisection models like this one)."""
    frames = list(moving_circle_frames(4, 32, 32))
    out = list(engine.interpolate_video_frames(iter(frames), factor=3,
                                               batch_pairs=2))
    assert len(out) == 4 + 2 * 3           # 3 pairs x 2 intermediates
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(out[3 * i], f)


def test_retime_requires_exact_time_model(engine):
    frames = list(moving_circle_frames(3, 32, 32))
    assert not engine.supports_exact_time
    with pytest.raises(ValueError, match="exact-time"):
        list(engine.retime_video_frames(iter(frames), rate=2.5))


def test_video_file_roundtrip(rgb_engine, tmp_path):
    src = write_fixture_video(str(tmp_path / "in.mp4"), num_frames=6,
                              height=32, width=32, fps=10)
    out = str(tmp_path / "out.mp4")
    stats = rgb_engine.interpolate_video_file(src, out, factor=2,
                                              batch_pairs=4)
    assert os.path.getsize(out) > 0
    assert stats["output_frames"] == 11
    r = VideoReader(out)
    assert abs(r.fps - 20) < 0.1          # fps doubled
    assert len(list(r)) == 11


def test_grayscale_model_on_color_video(engine, tmp_path):
    # 1-channel parity model consumes color video via grayscale conversion
    # (the reference pipeline is grayscale end-to-end, model/inference.py:11-41)
    src = write_fixture_video(str(tmp_path / "c.mp4"), num_frames=4,
                              height=32, width=32)
    out = str(tmp_path / "g.mp4")
    stats = engine.interpolate_video_file(src, out, factor=2, batch_pairs=2)
    assert stats["output_frames"] == 7


def test_linear_transition_frames():
    f1 = np.zeros((8, 8, 1), np.uint8)
    f2 = np.full((8, 8, 1), 200, np.uint8)
    frames = InterpolationEngine.linear_transition_frames(f1, f2, 3)
    assert [int(f.mean()) for f in frames] == [50, 100, 150]


def test_interpolate_at_arbitrary_times(tiny_frames):
    from ai_based_frame_interpolation_tpu.config import ModelConfig

    f1, f2 = tiny_frames
    eng = InterpolationEngine.random_init(
        ModelConfig(base_width=4, time_conditioned=True), seed=1)
    frames = eng.interpolate_at(f1, f2, [0.25, 0.5, 0.75])
    assert len(frames) == 3
    assert frames[0].shape == f1.shape and frames[0].dtype == np.uint8
    # a time-conditioned model must produce time-dependent output
    assert not np.array_equal(frames[0], frames[2])


def test_interpolate_at_requires_time_conditioning(engine, tiny_frames):
    f1, f2 = tiny_frames
    with pytest.raises(ValueError):
        engine.interpolate_at(f1, f2, [0.5])


def test_engine_is_garbage_collectable(tiny_frames):
    """Dropped engines (and their compiled executables) must be collectable.

    Round-1 regression: functools.lru_cache on bound methods keyed the
    global cache on ``self``, keeping every engine alive forever. The
    per-instance cache must not create an uncollectable cycle either.
    """
    import gc
    import weakref

    from ai_based_frame_interpolation_tpu.config import ModelConfig

    f1, f2 = tiny_frames
    eng = InterpolationEngine.random_init(ModelConfig(base_width=4), seed=2)
    eng.interpolate_pair(f1, f2)            # populate the jit cache
    eng.generate_intermediate_frames(f1, f2, 3)
    assert len(eng._fn_cache) >= 2
    ref = weakref.ref(eng)
    del eng
    gc.collect()
    assert ref() is None, "engine leaked after drop (jit cache held it)"


def test_unet_split_jit_matches_single_program(tiny_frames):
    """The two-program unet 2x path (s2d core jit + fused-refine jit,
    round-5 RGB batch-scaling unlock) must produce the same midpoint as
    the monolithic program. Forced on via override + refine_impl="pallas"
    (interpret mode) so the split's program-B kernel runs on CPU."""
    from ai_based_frame_interpolation_tpu.config import ModelConfig

    f1, f2 = tiny_frames
    f1 = np.repeat(f1, 3, axis=-1)          # RGB: the split's target mode
    f2 = np.repeat(f2, 3, axis=-1)
    cfg = ModelConfig(channels=3, space_to_depth=2, base_width=8,
                      refine_width=16, residual=True)
    eng = InterpolationEngine.random_init(cfg, seed=4)
    eng.unet_split_override = False
    eng.refine_impl = "pallas"              # same head both arms
    single = eng.interpolate_pair(f1, f2)
    eng2 = InterpolationEngine.random_init(cfg, seed=4)
    eng2.unet_split_override = True
    eng2.refine_impl = "pallas"
    split = eng2.interpolate_pair(f1, f2)
    assert single.shape == split.shape == f1.shape
    np.testing.assert_allclose(single.astype(int), split.astype(int),
                               atol=1)


def test_flow_split_jit_matches_single_program(tiny_frames):
    """The two-program flow path (motion jit + sampler jit, used to stay
    under the remote compile helper's graph limit for RGB at 1080p) must
    produce the same frames as the single-program path. uint8 outputs from
    different compiled programs may wobble 1 LSB (bf16 reduction order)."""
    from ai_based_frame_interpolation_tpu.config import ModelConfig

    f1, f2 = tiny_frames
    eng = InterpolationEngine.random_init(
        ModelConfig(arch="flow", base_width=4), seed=3)
    eng.flow_split_override = False
    single = eng.generate_intermediate_frames(f1, f2, 3)
    eng2 = InterpolationEngine.random_init(
        ModelConfig(arch="flow", base_width=4), seed=3)
    eng2.flow_split_override = True
    split = eng2.generate_intermediate_frames(f1, f2, 3)
    assert len(single) == len(split) == 3
    for a, b in zip(single, split):
        np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)
