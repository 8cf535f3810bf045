"""Census-transform loss properties (ops/census.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.ops.census import (census_loss,
                                                         census_transform)


@pytest.fixture(scope="module")
def img():
    y, x = np.mgrid[0:48, 0:48].astype(np.float32)
    f = 0.6 * np.sin(x / 5.0) * np.cos(y / 7.0)
    return jnp.asarray(f[None, ..., None])


def test_identical_images_zero_loss(img):
    assert float(census_loss(img, img)) == 0.0


def test_brightness_offset_near_invariant(img):
    # census encodes neighbor-difference signs: a constant offset leaves
    # every difference unchanged -> exactly invariant
    off = census_loss(img, img + 0.3)
    assert float(off) < 1e-6


def test_gain_near_invariant_vs_shift_sensitive(img):
    # a pure gain rescales differences but barely moves their soft signs;
    # an actual structural shift moves them a lot
    gain = float(census_loss(img, img * 0.7))
    shift = float(census_loss(img, jnp.roll(img, 5, axis=2)))
    assert gain < 0.15 * shift
    assert shift > 0.05


def test_transform_shape_and_multichannel(img):
    t = census_transform(img, window=5)
    assert t.shape == (1, 48, 48, 24)
    rgb = jnp.concatenate([img, img, img], axis=-1)
    # multi-channel reduces to luminance -> same descriptor up to the f32
    # rounding of mean(x,x,x), amplified by the soft-sign slope 1/sqrt(eps)
    # near zero differences
    np.testing.assert_allclose(np.asarray(census_transform(rgb, window=5)),
                               np.asarray(t), atol=5e-3)


def test_differentiable_finite_grad(img):
    g = jax.grad(lambda p: census_loss(p, jnp.roll(img, 2, axis=1)))(img)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


def test_train_step_with_census_weight():
    from ai_based_frame_interpolation_tpu.config import (LossConfig,
                                                         ModelConfig,
                                                         TrainConfig)
    from ai_based_frame_interpolation_tpu.models import build_model
    from ai_based_frame_interpolation_tpu.train.loop import (
        create_train_state, train_step)

    model = build_model(ModelConfig(base_width=4))
    f = jnp.zeros((1, 32, 32, 1), jnp.float32)
    variables = jax.jit(lambda a, b: model.init(
        jax.random.key(0), a, b, train=False))(f, f)
    state = create_train_state(model, variables, TrainConfig(batch_size=2))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(rng.integers(0, 255, (2, 32, 32, 1), np.uint8))
             for k in ("f0", "f1", "gt")}
    lcfg = LossConfig(census_weight=1.0)
    state2, loss = train_step(state, batch, lcfg)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(state2.params)
    assert all(np.all(np.isfinite(np.asarray(p))) for p in leaves)


def test_even_window_rejected(img):
    with pytest.raises(ValueError):
        census_transform(img, window=4)
