"""Model-core tests: parameter parity, shapes, dtypes, gradients.

Mirrors (and substantially exceeds) the reference's only real unit test —
model creation + forward-shape assert at ``test_basic.py:42-83``.

Full-size (17M-param) configs are checked with ``jax.eval_shape`` (no
compute/compile); behavioral tests run a narrow-width model so the whole file
compiles in seconds on the single-core CPU CI.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.models import (
    FrameInterpolationUNet, count_parameters)

TINY = ModelConfig(base_width=4)


def init_tiny(cfg=TINY, h=32, w=32, batch=1, seed=0):
    model = FrameInterpolationUNet(cfg=cfg)
    c = cfg.channels
    f = jnp.zeros((batch, h, w, c), jnp.float32)
    # jitted init: one fused compile instead of one compile per primitive
    variables = jax.jit(
        lambda a, b: model.init(jax.random.key(seed), a, b, train=False))(f, f)
    return model, variables


def shape_only_param_count(cfg):
    model = FrameInterpolationUNet(cfg=cfg)
    c = cfg.channels
    f = jax.ShapeDtypeStruct((1, 64, 64, c), jnp.float32)
    shapes = jax.eval_shape(lambda a, b: model.init(jax.random.key(0), a, b,
                                                    train=False), f, f)
    return count_parameters(shapes)


def test_param_count_parity_bilinear():
    # Reference deployed config: 17,262,401 params (SURVEY.md §6; measured by
    # instantiating reference model/unet.py:97-112 with bilinear=True).
    assert shape_only_param_count(ModelConfig(bilinear=True)) == 17_262_401


def test_param_count_parity_convtranspose():
    assert shape_only_param_count(ModelConfig(bilinear=False)) == 31_037_057


def test_param_count_rgb_mode():
    # README-advertised 6-in/3-out RGB variant (reference README.md:180-182):
    # only the first conv (2->6 in) and outc (1->3 out) change.
    n = shape_only_param_count(ModelConfig(channels=3, bilinear=True))
    delta_in = 3 * 3 * (6 - 2) * 64      # first 3x3 conv extra input channels
    delta_out = (64 + 1) * (3 - 1)        # outc 1x1 conv extra outputs
    assert n == 17_262_401 + delta_in + delta_out


@pytest.mark.parametrize("h,w", [(32, 32), (48, 32), (100, 72)])
def test_forward_shape(h, w):
    # (100, 72) is not a multiple of 16: exercises the decoder's
    # pad-and-concat skip alignment (reference model/unet.py:49-53).
    model, v = init_tiny(h=h, w=w)
    f = jnp.zeros((2, h, w, 1))
    out = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(v, f, f)
    assert out.shape == (2, h, w, 1)
    assert out.dtype == jnp.float32


def test_forward_shape_convtranspose():
    model, v = init_tiny(ModelConfig(base_width=4, bilinear=False))
    f = jnp.zeros((1, 32, 32, 1))
    out = jax.jit(lambda v, a, b: model.apply(v, a, b))(v, f, f)
    assert out.shape == (1, 32, 32, 1)


def test_forward_rgb_mode():
    model, v = init_tiny(ModelConfig(base_width=4, channels=3))
    f = jnp.zeros((1, 32, 32, 3))
    out = jax.jit(lambda v, a, b: model.apply(v, a, b))(v, f, f)
    assert out.shape == (1, 32, 32, 3)


@pytest.mark.parametrize("s2d,g", [(2, 1), (2, 2), (4, 2), (4, 4)])
def test_refine_head_shapes(s2d, g):
    cfg = ModelConfig(base_width=4, space_to_depth=s2d, refine_width=8,
                      residual=True, refine_factor=g)
    model, v = init_tiny(cfg)
    assert "refine1" in v["params"]
    # the factor-g head regresses all g*g sub-pixels per location
    out_ch = v["params"]["refine_out"]["kernel"].shape[-1]
    assert out_ch == g * g
    f = jnp.zeros((2, 64, 64, 1))
    out = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
        v, f, f)
    assert out.shape == (2, 64, 64, 1)


def test_s2d8_forward():
    """s2d=8 (the 2x-throughput 1080p/4K speed stem, CLI ``--s2d 8``):
    pad multiple is 128, core runs at H/8 x W/8 with 64x channels."""
    cfg = ModelConfig(base_width=4, space_to_depth=8, refine_width=8,
                      residual=True)
    assert cfg.pad_multiple == 128
    model, v = init_tiny(cfg, h=128, w=128)
    f = jnp.zeros((1, 128, 128, 1))
    out = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(v, f, f)
    assert out.shape == (1, 128, 128, 1)


def test_half_pixel_upsample_variant(rng):
    """upsample="half_pixel" (TPU-native decoder grid) builds, runs, and
    produces a genuinely different function from align_corners — while
    keeping the identical parameter structure (a training-time choice)."""
    cfg_a = ModelConfig(base_width=4, space_to_depth=2, refine_width=8)
    cfg_h = ModelConfig(base_width=4, space_to_depth=2, refine_width=8,
                        upsample="half_pixel")
    model_a, va = init_tiny(cfg_a)
    model_h = FrameInterpolationUNet(cfg=cfg_h)
    f1 = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    f2 = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    ya = jax.jit(lambda v, a, b: model_a.apply(v, a, b, train=False))(
        va, f1, f2)
    # same params, different decoder grid
    yh = jax.jit(lambda v, a, b: model_h.apply(v, a, b, train=False))(
        va, f1, f2)
    assert yh.shape == ya.shape == (1, 32, 32, 1)
    assert not np.allclose(np.asarray(ya, np.float32),
                           np.asarray(yh, np.float32), atol=1e-4)


def test_refine_factor_must_divide_s2d():
    with pytest.raises(ValueError, match="must divide"):
        init_tiny(ModelConfig(base_width=4, space_to_depth=4,
                              refine_width=8, refine_factor=3))


def test_time_conditioned_changes_output(rng):
    model, v = init_tiny(ModelConfig(base_width=4, time_conditioned=True))
    f1 = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    f2 = jnp.asarray(rng.random((1, 32, 32, 1), dtype=np.float32))
    fwd = jax.jit(lambda v, a, b, t: model.apply(v, a, b, t=t))
    o1 = fwd(v, f1, f2, jnp.array([0.25]))
    o2 = fwd(v, f1, f2, jnp.array([0.75]))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_train_mode_updates_batch_stats():
    model, v = init_tiny(batch=2)
    f = jax.random.normal(jax.random.key(1), (2, 32, 32, 1))
    _, updates = jax.jit(lambda v, a, b: model.apply(
        v, a, b, train=True, mutable=["batch_stats"]))(v, f, f)
    old = jax.tree.leaves(v["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_gradients_flow():
    model, v = init_tiny()
    f1 = jax.random.normal(jax.random.key(2), (1, 32, 32, 1))
    f2 = jax.random.normal(jax.random.key(3), (1, 32, 32, 1))

    def loss_fn(params):
        out = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                          f1, f2, train=True, mutable=["batch_stats"])[0]
        return jnp.mean(out ** 2)

    grads = jax.jit(jax.grad(loss_fn))(v["params"])
    norms = [float(jnp.abs(g).max()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(n) for n in norms)
    assert max(norms) > 0


def test_forward_is_jittable_and_deterministic():
    model, v = init_tiny()
    f1 = jax.random.normal(jax.random.key(4), (1, 32, 32, 1))
    f2 = jax.random.normal(jax.random.key(5), (1, 32, 32, 1))
    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))
    o1 = fwd(v, f1, f2)
    o2 = fwd(v, f1, f2)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
