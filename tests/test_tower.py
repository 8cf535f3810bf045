"""Tower model family: shapes, engine reuse path, training, folding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_based_frame_interpolation_tpu.config import ModelConfig, TrainConfig
from ai_based_frame_interpolation_tpu.data.synthetic import moving_circle_frames
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.models import (MODEL_REGISTRY,
                                                     build_model,
                                                     count_parameters)
from ai_based_frame_interpolation_tpu.train.loop import (create_train_state,
                                                         train_step)

TINY = ModelConfig(arch="tower", base_width=8)


@pytest.fixture(scope="module")
def tower_engine():
    return InterpolationEngine.random_init(TINY, seed=0)


def test_registry():
    assert set(MODEL_REGISTRY) == {"unet", "tower", "flow"}


def test_forward_shape():
    m = build_model(TINY, jnp.float32)
    f = jnp.zeros((2, 32, 32, 1))
    v = jax.jit(lambda a, b: m.init(jax.random.key(0), a, b,
                                    train=False))(f, f)
    out = jax.jit(lambda v, a, b: m.apply(v, a, b))(v, f, f)
    assert out.shape == (2, 32, 32, 1)


def test_engine_pair(tower_engine, tiny_frames):
    f1, f2 = tiny_frames
    mid = tower_engine.interpolate_pair(f1, f2)
    assert mid.shape == f1.shape and mid.dtype == np.uint8


def test_stream_reuse_matches_pairwise(tower_engine):
    # the feature-reuse stream must produce the same midpoints as
    # independent pair calls (same math, shared encode)
    frames = list(moving_circle_frames(6, 32, 32))
    out = list(tower_engine.interpolate_video_frames(iter(frames), factor=2,
                                                     batch_pairs=3))
    assert len(out) == 11
    for i, f in enumerate(frames):
        np.testing.assert_array_equal(out[2 * i], f)
    for i in range(5):
        direct = tower_engine.interpolate_pair(frames[i], frames[i + 1])
        np.testing.assert_allclose(out[2 * i + 1].astype(int),
                                   direct.astype(int), atol=1)


def test_stream_4x_falls_back(tower_engine):
    frames = list(moving_circle_frames(3, 32, 32))
    out = list(tower_engine.interpolate_video_frames(iter(frames), factor=4,
                                                     batch_pairs=2))
    assert len(out) == 3 + 2 * 3


def test_slim_decoder_shapes_and_fewer_params():
    wide = build_model(ModelConfig(arch="tower", base_width=8,
                                   space_to_depth=2), jnp.float32)
    slim = build_model(ModelConfig(arch="tower", base_width=8,
                                   space_to_depth=2, slim_decoder=True),
                       jnp.float32)
    f = jnp.zeros((2, 32, 32, 1))
    vw = jax.jit(lambda a, b: wide.init(jax.random.key(0), a, b,
                                        train=False))(f, f)
    vs = jax.jit(lambda a, b: slim.init(jax.random.key(0), a, b,
                                        train=False))(f, f)
    out = jax.jit(lambda v, a, b: slim.apply(v, a, b))(vs, f, f)
    assert out.shape == (2, 32, 32, 1)
    # halved decoder widths => clearly fewer parameters
    assert count_parameters(vs) < 0.6 * count_parameters(vw)


def test_tower_refine_head_shapes():
    m = build_model(ModelConfig(arch="tower", base_width=8,
                                space_to_depth=2, refine_width=8,
                                residual=True), jnp.float32)
    f = jnp.zeros((2, 32, 32, 1))
    v = jax.jit(lambda a, b: m.init(jax.random.key(0), a, b,
                                    train=False))(f, f)
    assert "refine1" in v["params"]
    out = jax.jit(lambda v, a, b: m.apply(v, a, b))(v, f, f)
    assert out.shape == (2, 32, 32, 1)


def test_slim_tower_stream_matches_pairwise():
    eng = InterpolationEngine.random_init(
        ModelConfig(arch="tower", base_width=8, space_to_depth=2,
                    slim_decoder=True, refine_width=8), seed=1)
    frames = list(moving_circle_frames(4, 32, 32))
    out = list(eng.interpolate_video_frames(iter(frames), factor=2,
                                            batch_pairs=2))
    assert len(out) == 7
    direct = eng.interpolate_pair(frames[1], frames[2])
    np.testing.assert_allclose(out[3].astype(int), direct.astype(int),
                               atol=1)


def test_tower_trains():
    m = build_model(TINY, jnp.bfloat16)
    f = jnp.zeros((1, 32, 32, 1), jnp.float32)
    v = jax.jit(lambda a, b: m.init(jax.random.key(0), a, b,
                                    train=False))(f, f)
    tcfg = TrainConfig(batch_size=4, learning_rate=1e-3)
    state = create_train_state(m, v, tcfg)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(rng.integers(0, 255, (4, 32, 32, 1), np.uint8))
             for k in ("f0", "f1", "gt")}
    losses = []
    for _ in range(6):
        state, loss = train_step(state, batch, tcfg.loss)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_tower_folding(tiny_frames):
    f1, f2 = tiny_frames
    folded = InterpolationEngine.random_init(TINY, seed=3)
    raw = InterpolationEngine.random_init(TINY, seed=3, fold=False)
    assert "batch_stats" not in folded.variables
    np.testing.assert_allclose(folded.interpolate_pair(f1, f2).astype(int),
                               raw.interpolate_pair(f1, f2).astype(int),
                               atol=2)


def test_tower_time_conditioned(tiny_frames):
    f1, f2 = tiny_frames
    eng = InterpolationEngine.random_init(
        ModelConfig(arch="tower", base_width=8, time_conditioned=True))
    frames = eng.interpolate_at(f1, f2, [0.2, 0.8])
    assert len(frames) == 2
    assert not np.array_equal(frames[0], frames[1])
