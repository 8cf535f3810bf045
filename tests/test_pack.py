"""Batch-to-channel packed core (``core_pack``): identical math to the
unpacked folded model.

The packed layout folds g batch items into the channel axis and runs every
U-Net conv as a ``feature_group_count=g`` grouped conv with the same per-item
weights tiled per group (``models.unet.pack_batch`` / ``tile_params_packed``)
— an inference-only HBM-layout optimization (XLA lane-pads thin-channel NHWC
activations to 128 in HBM; packing fills the lanes exactly). These tests pin
the exactness contract on CPU in f32 and the engine routing/fallback rules.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.models import build_model
from ai_based_frame_interpolation_tpu.models.unet import (
    FrameInterpolationUNet, fold_batchnorm, grouped_concat, pack_batch,
    tile_params_packed, unpack_batch)


def _folded(cfg, seed=3):
    model = FrameInterpolationUNet(cfg=cfg, compute_dtype=jnp.float32)
    f = jnp.zeros((1, 32, 32, cfg.channels), jnp.float32)
    v = jax.jit(lambda a, b: model.init(jax.random.key(seed), a, b,
                                        train=False))(f, f)
    rng = np.random.default_rng(0)
    v = dict(v)
    v["batch_stats"] = jax.tree.map(
        lambda x: jnp.asarray(
            np.abs(rng.normal(1.0, 0.3, x.shape)).astype(np.float32))
        if x.ndim else x, v["batch_stats"])
    return fold_batchnorm(v)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((6, 4, 4, 3), dtype=np.float32))
    for g in (1, 2, 3, 6):
        np.testing.assert_array_equal(
            np.asarray(unpack_batch(pack_batch(x, g), g)), np.asarray(x))


def test_grouped_concat_matches_per_item_concat():
    rng = np.random.default_rng(1)
    g = 2
    a = jnp.asarray(rng.random((4, 4, 4, 3), dtype=np.float32))
    b = jnp.asarray(rng.random((4, 4, 4, 5), dtype=np.float32))
    packed = grouped_concat([pack_batch(a, g), pack_batch(b, g)], g)
    expect = pack_batch(jnp.concatenate([a, b], axis=-1), g)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(expect))


@pytest.mark.parametrize("cfg", [
    ModelConfig(base_width=4),
    ModelConfig(base_width=4, space_to_depth=2, residual=True,
                refine_width=4),
    ModelConfig(base_width=4, time_conditioned=True),
], ids=["parity", "s2d-res-refine", "time-conditioned"])
def test_packed_model_matches_unpacked_f32(cfg):
    folded_v = _folded(cfg)
    g = 2
    packed_v = tile_params_packed(folded_v, g)
    base = build_model(cfg, jnp.float32, folded=True)
    packed = build_model(cfg, jnp.float32, folded=True, pack=g)
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.random((4, 32, 32, cfg.channels), dtype=np.float32))
    f2 = jnp.asarray(rng.random((4, 32, 32, cfg.channels), dtype=np.float32))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = jax.jit(lambda v, a, b: base.apply(v, a, b, train=False))(
            jax.device_put(folded_v, cpu), f1, f2)
        out = jax.jit(lambda v, a, b: packed.apply(v, a, b, train=False))(
            jax.device_put(packed_v, cpu), f1, f2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_engine_core_pack_matches_unpacked_uint8():
    cfg = ModelConfig(base_width=4, space_to_depth=2, residual=True,
                      refine_width=4)
    rng = np.random.default_rng(2)
    f1 = rng.integers(0, 255, (4, 32, 32, 1), dtype=np.uint8)
    f2 = rng.integers(0, 255, f1.shape, dtype=np.uint8)
    ref_eng = InterpolationEngine.random_init(cfg, seed=7)
    ref = ref_eng.interpolate_batch(f1, f2)
    eng = InterpolationEngine.random_init(cfg, seed=7, core_pack=2)
    assert eng._use_pack(4) and not eng._use_pack(3)
    out = eng.interpolate_batch(f1, f2)
    # bf16 rounding may differ between the two compiled programs
    assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1


def test_engine_core_pack_fallback_on_odd_batch():
    cfg = ModelConfig(base_width=4)
    rng = np.random.default_rng(3)
    f1 = rng.integers(0, 255, (3, 32, 32, 1), dtype=np.uint8)
    f2 = rng.integers(0, 255, f1.shape, dtype=np.uint8)
    eng = InterpolationEngine.random_init(cfg, seed=5, core_pack=2)
    ref = InterpolationEngine.random_init(cfg, seed=5).interpolate_batch(
        f1, f2)
    out = eng.interpolate_batch(f1, f2)   # 3 % 2 != 0 -> unpacked program
    assert np.max(np.abs(out.astype(int) - ref.astype(int))) <= 1


def test_tile_params_requires_folded():
    cfg = ModelConfig(base_width=4)
    model = FrameInterpolationUNet(cfg=cfg, compute_dtype=jnp.float32)
    f = jnp.zeros((1, 32, 32, 1), jnp.float32)
    v = jax.jit(lambda a, b: model.init(jax.random.key(0), a, b,
                                        train=False))(f, f)
    with pytest.raises(ValueError, match="folded"):
        tile_params_packed(v, 2)


def test_pack_requires_folded_model():
    cfg = ModelConfig(base_width=4)
    model = FrameInterpolationUNet(cfg=cfg, compute_dtype=jnp.float32,
                                   pack=2)
    f = jnp.zeros((2, 32, 32, 1), jnp.float32)
    with pytest.raises(ValueError, match="folded"):
        jax.jit(lambda a, b: model.init(jax.random.key(0), a, b,
                                        train=False))(f, f)
