"""Flow model family: shapes, endpoint consistency, arbitrary-time sampling,
engine fast paths, training, folding, constraints."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_based_frame_interpolation_tpu.config import ModelConfig, TrainConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.models import build_model
from ai_based_frame_interpolation_tpu.train.loop import (create_train_state,
                                                         train_step)

TINY = ModelConfig(arch="flow", base_width=8)


@pytest.fixture(scope="module")
def flow_engine():
    return InterpolationEngine.random_init(TINY, seed=0)


def init_tiny(dtype=jnp.float32, cfg=TINY):
    m = build_model(cfg, dtype)
    f = jnp.zeros((2, 32, 32, cfg.channels))
    v = jax.jit(lambda a, b: m.init(jax.random.key(0), a, b,
                                    train=False))(f, f)
    return m, v


def test_forward_shape():
    m, v = init_tiny()
    f = jnp.zeros((2, 32, 32, 1))
    out = jax.jit(lambda v, a, b: m.apply(v, a, b))(v, f, f)
    assert out.shape == (2, 32, 32, 1)


def test_motion_and_sample_compose_to_call(rng):
    m, v = init_tiny()
    f1 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    f2 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    t = jnp.full((1,), 0.5, jnp.float32)
    flow, mask = jax.jit(lambda v, a, b: m.apply(v, a, b,
                                                 method="motion"))(v, f1, f2)
    assert flow.shape == (1, 32, 32, 2) and mask.shape == (1, 32, 32, 1)
    assert float(mask.min()) >= 0 and float(mask.max()) <= 1
    y1 = jax.jit(lambda v, a, b, fl, mk, t: m.apply(
        v, a, b, fl, mk, t, method="sample"))(v, f1, f2, flow, mask, t)
    y2 = jax.jit(lambda v, a, b: m.apply(v, a, b))(v, f1, f2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_endpoint_consistency(rng):
    """By construction: t=0 reproduces frame1 and t=1 frame2 (up to the
    blend's eps where the mask saturates) — even with RANDOM weights."""
    m, v = init_tiny()
    f1 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    f2 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    fn = jax.jit(lambda v, a, b, t: m.apply(v, a, b, t=t))
    y0 = np.asarray(fn(v, f1, f2, jnp.zeros((1,))))
    y1 = np.asarray(fn(v, f1, f2, jnp.ones((1,))))
    np.testing.assert_allclose(y0, np.asarray(f1), atol=1e-3)
    np.testing.assert_allclose(y1, np.asarray(f2), atol=1e-3)


def test_known_translation_sampling():
    """With the TRUE flow injected, sampling a translating pattern at t=0.5
    reconstructs the analytic midpoint (linear motion is this family's
    modeling assumption)."""
    m, v = init_tiny()
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    base = np.sin(x / 3.0) * np.cos(y / 4.0)
    f1 = jnp.asarray(base[None, ..., None])
    shifted = np.sin((x + 4) / 3.0) * np.cos(y / 4.0)
    f2 = jnp.asarray(shifted[None, ..., None])   # pattern moved 4 px LEFT
    flow = jnp.zeros((1, 32, 32, 2)).at[..., 0].set(-4.0)
    mask = jnp.full((1, 32, 32, 1), 0.5)
    t = jnp.full((1,), 0.5, jnp.float32)
    out = np.asarray(jax.jit(lambda v, a, b, fl, mk, t: m.apply(
        v, a, b, fl, mk, t, method="sample"))(v, f1, f2, flow, mask, t))
    expect = np.sin((x + 2) / 3.0) * np.cos(y / 4.0)
    # interior only (borders replicate)
    np.testing.assert_allclose(out[0, :, 6:26, 0], expect[:, 6:26], atol=0.02)


def test_engine_pair_and_uint8(flow_engine, tiny_frames):
    f1, f2 = tiny_frames
    mid = flow_engine.interpolate_pair(f1, f2)
    assert mid.shape == f1.shape and mid.dtype == np.uint8


def test_engine_intermediates_exact_times(flow_engine, tiny_frames):
    """The flow _pair_fn samples exact i/(n+1) times — 3 distinct frames,
    time-ordered monotonically between the inputs on a translating scene."""
    f1, f2 = tiny_frames
    frames = flow_engine.generate_intermediate_frames(f1, f2, 3)
    assert len(frames) == 3
    assert not np.array_equal(frames[0], frames[1])
    assert not np.array_equal(frames[1], frames[2])


def test_engine_interpolate_at_without_flag(flow_engine, tiny_frames):
    """arch='flow' is time-conditioned by construction: interpolate_at works
    without cfg.time_conditioned."""
    f1, f2 = tiny_frames
    assert not flow_engine.cfg.time_conditioned
    a, b = flow_engine.interpolate_at(f1, f2, [0.25, 0.75])
    assert a.shape == f1.shape and not np.array_equal(a, b)


def test_flow_trains_and_beats_blend_on_translation():
    """End-to-end: on a pure-translation batch the flow family must learn to
    reduce the loss — the gradient path through the warp works."""
    m, v = init_tiny(jnp.bfloat16)
    tcfg = TrainConfig(batch_size=4, learning_rate=3e-3)
    state = create_train_state(m, v, tcfg)
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    mk = lambda s: np.clip(  # noqa: E731
        127 + 90 * np.sin((x + s) / 3.0) * np.cos(y / 4.0),
        0, 255).astype(np.uint8)[None, ..., None]
    batch = {"f0": jnp.asarray(np.repeat(mk(0), 4, 0)),
             "f1": jnp.asarray(np.repeat(mk(6), 4, 0)),
             "gt": jnp.asarray(np.repeat(mk(3), 4, 0))}
    losses = []
    for _ in range(25):
        state, loss = train_step(state, batch, tcfg.loss)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_flow_refine_head():
    cfg = ModelConfig(arch="flow", base_width=8, refine_width=8)
    m = build_model(cfg, jnp.float32)
    f = jnp.zeros((1, 32, 32, 1))
    v = jax.jit(lambda a, b: m.init(jax.random.key(0), a, b,
                                    train=False))(f, f)
    assert "refine1" in v["params"]
    out = jax.jit(lambda v, a, b: m.apply(v, a, b))(v, f, f)
    assert out.shape == (1, 32, 32, 1)


def test_flow_folding(tiny_frames):
    f1, f2 = tiny_frames
    folded = InterpolationEngine.random_init(TINY, seed=3)
    raw = InterpolationEngine.random_init(TINY, seed=3, fold=False)
    assert "batch_stats" not in folded.variables
    np.testing.assert_allclose(folded.interpolate_pair(f1, f2).astype(int),
                               raw.interpolate_pair(f1, f2).astype(int),
                               atol=2)


def test_flow_rejects_space_to_depth():
    with pytest.raises(ValueError, match="space_to_depth"):
        m = build_model(ModelConfig(arch="flow", base_width=8,
                                    space_to_depth=2), jnp.float32)
        f = jnp.zeros((1, 32, 32, 1))
        jax.jit(lambda a, b: m.init(jax.random.key(0), a, b,
                                    train=False))(f, f)


def test_flow_scale_full_res_field_and_endpoints(rng):
    """flow_scale=2: backbone sees pooled frames but motion() must return a
    FULL-resolution field, and the t=0/1 endpoint identity still holds (it
    is a property of the full-res warp+blend, not of the field)."""
    cfg = ModelConfig(arch="flow", base_width=8, flow_scale=2)
    m, v = init_tiny(cfg=cfg)
    f1 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    f2 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    flow, mask = jax.jit(lambda v, a, b: m.apply(v, a, b,
                                                 method="motion"))(v, f1, f2)
    assert flow.shape == (1, 32, 32, 2) and mask.shape == (1, 32, 32, 1)
    fn = jax.jit(lambda v, a, b, t: m.apply(v, a, b, t=t))
    np.testing.assert_allclose(np.asarray(fn(v, f1, f2, jnp.zeros((1,)))),
                               np.asarray(f1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fn(v, f1, f2, jnp.ones((1,)))),
                               np.asarray(f2), atol=1e-3)


def test_flow_scale_pad_multiple():
    assert ModelConfig(arch="flow", flow_scale=4).pad_multiple == 64
    assert ModelConfig(arch="flow", flow_scale=1).pad_multiple == 16


def test_flow_scale_trains():
    """Gradients flow through pool -> backbone -> field upsample -> warp."""
    cfg = ModelConfig(arch="flow", base_width=8, flow_scale=2)
    m, v = init_tiny(jnp.bfloat16, cfg=cfg)
    tcfg = TrainConfig(batch_size=4, learning_rate=3e-3)
    state = create_train_state(m, v, tcfg)
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    mk = lambda s: np.clip(  # noqa: E731
        127 + 90 * np.sin((x + s) / 3.0) * np.cos(y / 4.0),
        0, 255).astype(np.uint8)[None, ..., None]
    batch = {"f0": jnp.asarray(np.repeat(mk(0), 4, 0)),
             "f1": jnp.asarray(np.repeat(mk(6), 4, 0)),
             "gt": jnp.asarray(np.repeat(mk(3), 4, 0))}
    losses = []
    for _ in range(25):
        state, loss = train_step(state, batch, tcfg.loss)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_flow_scale_engine_roundtrip():
    """Engine pads to flow_scale * 2**depth and crops back; odd input sizes
    still round-trip through the uint8 path."""
    cfg = ModelConfig(arch="flow", base_width=8, flow_scale=2)
    eng = InterpolationEngine.random_init(cfg, seed=1)
    rng = np.random.default_rng(0)
    f1 = rng.integers(0, 255, (50, 70, 1), np.uint8)
    f2 = rng.integers(0, 255, (50, 70, 1), np.uint8)
    mid = eng.interpolate_pair(f1, f2)
    assert mid.shape == (50, 70, 1) and mid.dtype == np.uint8


def _tiny_stream(n=5, h=32, w=32):
    rng = np.random.default_rng(7)
    base = rng.integers(30, 80, (h, w, 1), np.uint8)
    out = []
    for i in range(n):
        f = base.copy()
        f[10:20, 4 * i:4 * i + 8] = 230
        out.append(f)
    return out


def test_flow_retime_fractional(flow_engine):
    """rate=2.5 (24->60 fps): 5 inputs -> floor(4*2.5)+1 = 11 outputs,
    originals pass through LOSSLESSLY wherever k/rate hits an input frame
    (k=0,5,10 -> inputs 0,2,4)."""
    frames = _tiny_stream(5)
    out = list(flow_engine.retime_video_frames(iter(frames), rate=2.5))
    assert len(out) == 11
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[5], frames[2])
    np.testing.assert_array_equal(out[10], frames[4])
    assert all(f.shape == frames[0].shape and f.dtype == np.uint8
               for f in out)
    assert not np.array_equal(out[1], out[2])  # distinct synthesized times


def test_flow_retime_downsample_rate(flow_engine):
    """rate=0.5 keeps every other frame exactly (pure timeline decimation)."""
    frames = _tiny_stream(5)
    out = list(flow_engine.retime_video_frames(iter(frames), rate=0.5))
    assert len(out) == 3
    for o, f in zip(out, frames[::2]):
        np.testing.assert_array_equal(o, f)


def test_flow_retime_batch_boundary_consistency(flow_engine):
    """Batched and unbatched retiming must produce the same stream."""
    frames = _tiny_stream(7)
    a = list(flow_engine.retime_video_frames(iter(frames), rate=2.4,
                                             batch_pairs=1))
    b = list(flow_engine.retime_video_frames(iter(frames), rate=2.4,
                                             batch_pairs=4))
    assert len(a) == len(b) == 15   # floor(6 * 2.4) + 1
    for x, y in zip(a, b):
        np.testing.assert_allclose(x.astype(int), y.astype(int), atol=1)


def test_flow_retime_integer_rate_matches_factor_path(flow_engine):
    """rate=2 must produce the same frame times as factor=2 interpolation."""
    frames = _tiny_stream(4)
    a = list(flow_engine.retime_video_frames(iter(frames), rate=2.0))
    b = list(flow_engine.interpolate_video_frames(iter(frames), factor=2,
                                                  batch_pairs=2))
    assert len(a) == len(b) == 7
    for x, y in zip(a[::2], b[::2]):
        np.testing.assert_array_equal(x, y)
    for x, y in zip(a[1::2], b[1::2]):   # same t=0.5 through 2 compiled fns
        np.testing.assert_allclose(x.astype(int), y.astype(int), atol=1)


def test_flow_video_factor3_exact_times(flow_engine):
    frames = _tiny_stream(3)
    out = list(flow_engine.interpolate_video_frames(iter(frames), factor=3,
                                                    batch_pairs=2))
    assert len(out) == 3 + 2 * 2
    np.testing.assert_array_equal(out[0], frames[0])
    np.testing.assert_array_equal(out[3], frames[1])
    np.testing.assert_array_equal(out[6], frames[2])


def test_flow_smoothness_metric_properties():
    """Rough fields score higher than smooth ones; image edges forgive."""
    from ai_based_frame_interpolation_tpu.train.loop import flow_smoothness
    rng = np.random.default_rng(0)
    flat_img = jnp.zeros((1, 16, 16, 1))
    smooth_flow = jnp.ones((1, 16, 16, 2))
    rough_flow = jnp.asarray(rng.normal(0, 2, (1, 16, 16, 2)), jnp.float32)
    s_smooth = float(flow_smoothness(smooth_flow, flat_img))
    s_rough = float(flow_smoothness(rough_flow, flat_img))
    assert s_smooth < 1e-6 < s_rough
    # the SAME flow discontinuity costs less when it sits on an image edge
    step_flow = jnp.concatenate([jnp.zeros((1, 16, 8, 2)),
                                 jnp.ones((1, 16, 8, 2)) * 4], axis=2)
    edge_img = jnp.concatenate([-jnp.ones((1, 16, 8, 1)),
                                jnp.ones((1, 16, 8, 1))], axis=2)
    assert float(flow_smoothness(step_flow, edge_img)) < \
        float(flow_smoothness(step_flow, flat_img))


def test_flow_smooth_weight_trains():
    """The regularized loss still trains end-to-end (sow -> intermediates
    -> gradient through the field)."""
    from ai_based_frame_interpolation_tpu.config import LossConfig
    m, v = init_tiny(jnp.bfloat16)
    tcfg = TrainConfig(batch_size=4, learning_rate=3e-3,
                       loss=LossConfig(flow_smooth_weight=0.05))
    state = create_train_state(m, v, tcfg)
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    mk = lambda s: np.clip(  # noqa: E731
        127 + 90 * np.sin((x + s) / 3.0) * np.cos(y / 4.0),
        0, 255).astype(np.uint8)[None, ..., None]
    batch = {"f0": jnp.asarray(np.repeat(mk(0), 4, 0)),
             "f1": jnp.asarray(np.repeat(mk(6), 4, 0)),
             "gt": jnp.asarray(np.repeat(mk(3), 4, 0))}
    losses = []
    for _ in range(25):
        state, loss = train_step(state, batch, tcfg.loss)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    # and the regularizer actually contributes: same weights/batch,
    # weight on vs off (fresh init — train_step donates its state)
    from ai_based_frame_interpolation_tpu.train.loop import _loss_and_updates
    m2, v2 = init_tiny(jnp.bfloat16)
    loss_off, _ = _loss_and_updates(v2["params"], v2["batch_stats"],
                                    m2.apply, batch, LossConfig())
    loss_on, _ = _loss_and_updates(v2["params"], v2["batch_stats"],
                                   m2.apply, batch, tcfg.loss)
    assert float(loss_on) > float(loss_off)


def test_flow_rgb():
    cfg = ModelConfig(arch="flow", base_width=8, channels=3)
    eng = InterpolationEngine.random_init(cfg, seed=1)
    rng = np.random.default_rng(0)
    f1 = rng.integers(0, 255, (48, 48, 3), np.uint8)
    f2 = rng.integers(0, 255, (48, 48, 3), np.uint8)
    mid = eng.interpolate_pair(f1, f2)
    assert mid.shape == (48, 48, 3) and mid.dtype == np.uint8


def test_flow_bidir_motion_shape_and_endpoints(rng):
    """flow_bidir: 4-channel field from motion(); the t=0/1 endpoint
    identity holds by construction (both time-t warp fields vanish at
    their own endpoint)."""
    cfg = ModelConfig(arch="flow", base_width=8, flow_bidir=True)
    m, v = init_tiny(cfg=cfg)
    f1 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    f2 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    flow, mask = jax.jit(lambda v, a, b: m.apply(v, a, b,
                                                 method="motion"))(v, f1, f2)
    assert flow.shape == (1, 32, 32, 4) and mask.shape == (1, 32, 32, 1)
    fn = jax.jit(lambda v, a, b, t: m.apply(v, a, b, t=t))
    np.testing.assert_allclose(np.asarray(fn(v, f1, f2, jnp.zeros((1,)))),
                               np.asarray(f1), atol=1e-3)
    np.testing.assert_allclose(np.asarray(fn(v, f1, f2, jnp.ones((1,)))),
                               np.asarray(f2), atol=1e-3)


def test_flow_bidir_reduces_to_single_field(rng):
    """With f2->f1 = -(f1->f2) injected, the bidirectional sampler is
    EXACTLY the single-field sampler at every t (strict generalization;
    sample() is parameter-free without a refine head)."""
    m1, v1 = init_tiny()
    cfgb = ModelConfig(arch="flow", base_width=8, flow_bidir=True)
    mb, vb = init_tiny(cfg=cfgb)
    f1 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    f2 = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    f01 = jnp.asarray(rng.normal(0, 2, (1, 32, 32, 2)).astype(np.float32))
    mask = jnp.full((1, 32, 32, 1), 0.3, jnp.float32)
    for tv in (0.25, 0.5, 0.8):
        t = jnp.full((1,), tv, jnp.float32)
        ys = jax.jit(lambda v, a, b, fl, mk, t: m1.apply(
            v, a, b, fl, mk, t, method="sample"))(v1, f1, f2, f01, mask, t)
        yb = jax.jit(lambda v, a, b, fl, mk, t: mb.apply(
            v, a, b, fl, mk, t, method="sample"))(
                vb, f1, f2, jnp.concatenate([f01, -f01], -1), mask, t)
        np.testing.assert_allclose(np.asarray(yb), np.asarray(ys), atol=1e-5)


def test_flow_bidir_trains():
    """Gradients flow through both endpoint fields' time-t combination."""
    cfg = ModelConfig(arch="flow", base_width=8, flow_bidir=True)
    m, v = init_tiny(jnp.bfloat16, cfg=cfg)
    tcfg = TrainConfig(batch_size=4, learning_rate=3e-3)
    state = create_train_state(m, v, tcfg)
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    mk = lambda s: np.clip(  # noqa: E731
        127 + 90 * np.sin((x + s) / 3.0) * np.cos(y / 4.0),
        0, 255).astype(np.uint8)[None, ..., None]
    batch = {"f0": jnp.asarray(np.repeat(mk(0), 4, 0)),
             "f1": jnp.asarray(np.repeat(mk(6), 4, 0)),
             "gt": jnp.asarray(np.repeat(mk(3), 4, 0))}
    losses = []
    for _ in range(25):
        state, loss = train_step(state, batch, tcfg.loss)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_flow_photo_loss_trains_and_grounds_field():
    """Endpoint photometric supervision: contributes to the loss, trains,
    and with the TRUE field injected the photometric term is ~0 on a pure
    translation (the warp conventions match the sampler's endpoints)."""
    from ai_based_frame_interpolation_tpu.config import LossConfig
    from ai_based_frame_interpolation_tpu.train.loop import _loss_and_updates
    m, v = init_tiny(jnp.bfloat16)
    pcfg = LossConfig(flow_photo_weight=0.1)
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    mk = lambda s: np.clip(  # noqa: E731
        127 + 90 * np.sin((x + s) / 3.0) * np.cos(y / 4.0),
        0, 255).astype(np.uint8)[None, ..., None]
    batch = {"f0": jnp.asarray(np.repeat(mk(0), 4, 0)),
             "f1": jnp.asarray(np.repeat(mk(6), 4, 0)),
             "gt": jnp.asarray(np.repeat(mk(3), 4, 0))}
    loss_off, _ = _loss_and_updates(v["params"], v["batch_stats"],
                                    m.apply, batch, LossConfig())
    loss_on, _ = _loss_and_updates(v["params"], v["batch_stats"],
                                   m.apply, batch, pcfg)
    assert float(loss_on) > float(loss_off)
    # trains end-to-end (both single-field and bidir shapes)
    for cfg in (TINY, ModelConfig(arch="flow", base_width=8,
                                  flow_bidir=True)):
        m2, v2 = init_tiny(jnp.bfloat16, cfg=cfg)
        tcfg = TrainConfig(batch_size=4, learning_rate=3e-3, loss=pcfg)
        state = create_train_state(m2, v2, tcfg)
        losses = []
        for _ in range(15):
            state, loss = train_step(state, batch, tcfg.loss)
            losses.append(float(loss))
        assert losses[-1] < losses[0]


def test_flow_photo_term_zero_with_true_field():
    """Direct check of the endpoint warp conventions: with the analytic
    field of a translating pattern, warp(f0, F10) == f1 and
    warp(f1, F01) == f0 (interior), so the photometric residual vanishes."""
    from ai_based_frame_interpolation_tpu.ops.warp import backward_warp
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    f0 = (np.sin(x / 3.0) * np.cos(y / 4.0))[None, ..., None]
    f1 = (np.sin((x + 4) / 3.0) * np.cos(y / 4.0))[None, ..., None]
    # pattern content moves 4 px LEFT => pixel at x in f1 was at x+4 in f0:
    # F01 (f0 -> f1 motion) = -4 in x
    f01 = np.zeros((1, 32, 32, 2), np.float32)
    f01[..., 0] = -4.0
    r1 = np.asarray(backward_warp(jnp.asarray(f0), jnp.asarray(-f01)))
    r0 = np.asarray(backward_warp(jnp.asarray(f1), jnp.asarray(f01)))
    np.testing.assert_allclose(r1[0, :, 6:26, 0], f1[0, :, 6:26, 0],
                               atol=0.02)
    np.testing.assert_allclose(r0[0, :, 6:26, 0], f0[0, :, 6:26, 0],
                               atol=0.02)


def test_warp_impl_knob_is_output_invariant(tiny_frames):
    """cfg.warp_impl ("gather4" vs "patch", ops/warp.py) is a pure speed
    knob: identical uint8 output through the full engine path, so it is
    safe to flip on existing checkpoints."""
    f1, f2 = tiny_frames
    outs = []
    for impl in ("gather4", "patch"):
        cfg = ModelConfig(arch="flow", base_width=8, warp_impl=impl)
        eng = InterpolationEngine.random_init(cfg, seed=0)
        outs.append(eng.interpolate_pair(f1, f2))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_flow_cascade_starts_as_identity(tiny_frames):
    """cfg.flow_cascade stages have zero-initialized residual heads: at
    init the cascaded model's motion field must equal the cascade-free
    model's (same backbone seed), so training starts from the proven
    baseline and only learns corrections."""
    import jax
    import jax.numpy as jnp

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.models.flow import FlowInterpolator
    from ai_based_frame_interpolation_tpu.ops.image import normalize_uint8

    f1u, f2u = tiny_frames
    x1 = normalize_uint8(f1u[None], jnp.float32)
    x2 = normalize_uint8(f2u[None], jnp.float32)

    flows = {}
    for cascade in (0, 2):
        cfg = ModelConfig(arch="flow", base_width=4, flow_cascade=cascade)
        m = FlowInterpolator(cfg=cfg, compute_dtype=jnp.float32)
        v = jax.jit(lambda a, b: m.init(jax.random.key(7), a, b,
                                        train=False))(x1, x2)
        if cascade:
            assert any(k.startswith("cascade") for k in v["params"])
        flows[cascade] = jax.jit(
            lambda v, a, b: m.apply(v, a, b, train=False,
                                    method="motion"))(v, x1, x2)[0]
    np.testing.assert_allclose(np.asarray(flows[0]), np.asarray(flows[2]),
                               atol=1e-5)


def test_flow_cascade_trains_and_changes_field(tiny_frames):
    """A gradient step must reach the cascade parameters (the zero init
    must not block learning: the residual head's INPUT gradients are
    nonzero)."""
    import jax
    import jax.numpy as jnp
    import optax

    from ai_based_frame_interpolation_tpu.config import ModelConfig
    from ai_based_frame_interpolation_tpu.models.flow import FlowInterpolator
    from ai_based_frame_interpolation_tpu.ops.image import normalize_uint8

    f1u, f2u = tiny_frames
    x1 = normalize_uint8(f1u[None], jnp.float32)
    x2 = normalize_uint8(f2u[None], jnp.float32)
    gt = normalize_uint8(np.roll(f1u, 3, axis=1)[None], jnp.float32)

    cfg = ModelConfig(arch="flow", base_width=4, flow_cascade=1)
    m = FlowInterpolator(cfg=cfg, compute_dtype=jnp.float32)
    v = jax.jit(lambda a, b: m.init(jax.random.key(7), a, b,
                                    train=False))(x1, x2)

    def loss_fn(params):
        out = m.apply({"params": params, **{k: v[k] for k in v
                                            if k != "params"}},
                      x1, x2, train=False)
        return jnp.mean((out - gt) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(v["params"])
    gnorm = float(optax.global_norm(
        {k: g for k, g in grads.items() if k.startswith("cascade")}))
    assert gnorm > 0, "no gradient reached the cascade stage"
