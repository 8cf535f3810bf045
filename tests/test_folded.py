"""BatchNorm folding: the folded inference model must match the unfolded one."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.models.unet import (
    FrameInterpolationUNet, fold_batchnorm)

TINY = ModelConfig(base_width=4)


def make_variables(cfg=TINY, seed=3):
    model = FrameInterpolationUNet(cfg=cfg, compute_dtype=jnp.float32)
    f = jnp.zeros((1, 32, 32, cfg.channels), jnp.float32)
    v = jax.jit(lambda a, b: model.init(jax.random.key(seed), a, b,
                                        train=False))(f, f)
    # make BN stats non-trivial (fresh init is mean=0/var=1 => folding is
    # near-identity and would hide sign errors)
    rng = np.random.default_rng(0)
    v = dict(v)
    v["batch_stats"] = jax.tree.map(
        lambda x: jnp.asarray(
            np.abs(rng.normal(1.0, 0.3, x.shape)).astype(np.float32))
        if x.ndim else x, v["batch_stats"])
    return model, v


def test_folded_matches_unfolded_f32():
    model, v = make_variables()
    folded_v = fold_batchnorm(v)
    folded_model = FrameInterpolationUNet(cfg=TINY,
                                          compute_dtype=jnp.float32,
                                          folded=True)
    rng = np.random.default_rng(1)
    f1 = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    f2 = jnp.asarray(rng.random((2, 32, 32, 1), dtype=np.float32))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ref = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
            jax.device_put(v, cpu), f1, f2)
        out = jax.jit(lambda v, a, b: folded_model.apply(v, a, b,
                                                         train=False))(
            jax.device_put(folded_v, cpu), f1, f2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_folded_param_structure():
    _, v = make_variables()
    folded = fold_batchnorm(v)
    p = folded["params"]["unet"]
    assert "bn1" not in p["inc"]
    assert "bias" in p["inc"]["conv1"]          # conv gained the BN bias
    assert "kernel" in p["outc"]                # outc untouched
    assert "batch_stats" not in folded


def test_engine_folds_by_default(tiny_frames):
    f1, f2 = tiny_frames
    eng_folded = InterpolationEngine.random_init(TINY, seed=0)
    eng_raw = InterpolationEngine.random_init(TINY, seed=0, fold=False)
    assert "batch_stats" not in eng_folded.variables
    assert "batch_stats" in eng_raw.variables
    a = eng_folded.interpolate_pair(f1, f2)
    b = eng_raw.interpolate_pair(f1, f2)
    # identical math up to bf16/uint8 rounding
    np.testing.assert_allclose(a.astype(int), b.astype(int), atol=2)
