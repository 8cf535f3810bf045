"""Parity of the transposed-layout inference core (models/core_t.py) with
the NHWC Flax forward, interpret-mode on CPU.

The transposed core re-plumbs the SAME folded weights through the fused
double-conv kernel + transposed pools/upsamples/concats; its output must
match ``model.apply(..., skip_refine=True)`` to bf16 accumulation noise.
TPU bit-level validation + the throughput A/B live in
``scripts/core_t_ab.py`` (docs/PERF.md round-4 section)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.models import build_model
from ai_based_frame_interpolation_tpu.models import core_t
from ai_based_frame_interpolation_tpu.models.unet import fold_batchnorm

# smallest eligible geometry: r=2 keeps the full-res test tensors tiny
# while every transposed width (512/256/128) sits exactly on the lane grid
CFG = ModelConfig(space_to_depth=2, base_width=8, refine_width=16,
                  residual=True)
H, W = 64, 1024


def _folded(cfg, seed=0):
    model = build_model(cfg)
    f = jnp.zeros((1, 32, 32, cfg.channels), jnp.float32)
    v = jax.jit(lambda a, b: model.init(jax.random.key(seed), a, b,
                                        train=False))(f, f)
    rng = np.random.default_rng(1)
    v = dict(v)
    v["batch_stats"] = jax.tree.map(
        lambda x: jnp.asarray(
            np.abs(rng.normal(1.0, 0.2, x.shape)).astype(np.float32))
        if x.ndim else x, v["batch_stats"])
    folded_v = fold_batchnorm(v)
    folded_model = build_model(cfg, folded=True)
    return folded_model, folded_v


def _frames(cfg, seed=7):
    rng = np.random.default_rng(seed)
    shape = (1, H, W, cfg.channels)
    f1 = jnp.asarray(rng.random(shape, dtype=np.float32) * 2 - 1)
    f2 = jnp.asarray(rng.random(shape, dtype=np.float32) * 2 - 1)
    return f1, f2


@pytest.mark.parametrize("upsample", ["align_corners", "half_pixel"])
@pytest.mark.parametrize("residual", [True, False])
def test_forward_parity(upsample, residual):
    cfg = ModelConfig(space_to_depth=2, base_width=8, refine_width=16,
                      residual=residual, upsample=upsample)
    assert core_t.eligible(cfg, H, W)
    model, v = _folded(cfg)
    f1, f2 = _frames(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        v = jax.device_put(v, cpu)
        want = jax.jit(lambda v, a, b: model.apply(
            v, a, b, train=False, skip_refine=True))(v, f1, f2)
        got = jax.jit(lambda p, a, b: core_t.forward_pre_refine(
            p, a, b, cfg, interpret=True))(v["params"], f1, f2)
    assert got.shape == want.shape and got.dtype == want.dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.08, rtol=0.05)


def test_rgb_parity():
    cfg = ModelConfig(space_to_depth=2, base_width=8, refine_width=16,
                      channels=3, residual=True)
    assert core_t.eligible(cfg, H, W)
    model, v = _folded(cfg)
    f1, f2 = _frames(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        v = jax.device_put(v, cpu)
        want = jax.jit(lambda v, a, b: model.apply(
            v, a, b, train=False, skip_refine=True))(v, f1, f2)
        got = jax.jit(lambda p, a, b: core_t.forward_pre_refine(
            p, a, b, cfg, interpret=True))(v["params"], f1, f2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.08, rtol=0.05)


def test_eligibility_predicate():
    ok = ModelConfig(space_to_depth=4, base_width=64, refine_width=64,
                     residual=True)
    assert core_t.eligible(ok, 1088, 1920)          # production 1080p
    assert core_t.eligible(ok, 2176, 3840)          # 4K
    assert not core_t.eligible(ok, 768, 1280)       # 720p: W1 ratio 1.6
    assert not core_t.eligible(ok, 256, 256)        # small: ratio 2x
    assert not core_t.eligible(
        ModelConfig(space_to_depth=1), 1088, 1920)  # parity arch: no s2d
    assert not core_t.eligible(
        ModelConfig(space_to_depth=4, time_conditioned=True), 1088, 1920)
    assert not core_t.eligible(
        ModelConfig(space_to_depth=4, depth=3), 1088, 1920)
    assert not core_t.eligible(
        ModelConfig(arch="flow"), 1088, 1920)


def test_engine_routing_parity():
    """core_impl="pallas" (interpret) must match the XLA engine on uint8
    output to 1 LSB, through the full pair fn (normalize, core, fused
    refine head, denormalize)."""
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    cfg = ModelConfig(space_to_depth=2, base_width=8, refine_width=16,
                      residual=True)
    rng = np.random.default_rng(3)
    f1 = rng.integers(0, 255, (1, H, W, 1), np.uint8)
    f2 = rng.integers(0, 255, (1, H, W, 1), np.uint8)

    eng_x = InterpolationEngine.random_init(cfg)
    out_x = np.asarray(eng_x.interpolate_pair(f1[0], f2[0]))

    eng_p = InterpolationEngine.random_init(cfg)
    eng_p.core_impl = "pallas"
    eng_p.refine_impl = "pallas"
    assert eng_p._core_t_ok(jnp.zeros((1, H, W, 1)))
    out_p = np.asarray(eng_p.interpolate_pair(f1[0], f2[0]))

    assert out_p.shape == out_x.shape
    delta = np.abs(out_p.astype(np.int16) - out_x.astype(np.int16))
    assert delta.max() <= 1, f"max uint8 delta {delta.max()}"


def test_round4_routing_defaults():
    """Pin the round-4 measured dispositions (docs/PERF.md): the
    transposed core and the refine direct mode are OPTIONS, not defaults
    — the throughput-batch benches regress if these flip silently."""
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)
    from ai_based_frame_interpolation_tpu.ops.pallas import refine_fused

    eng = InterpolationEngine.random_init(ModelConfig(base_width=4))
    assert eng.core_impl == "xla"
    # direct refine: gray + wd>=512 only (the wd<512 compiled miscompile
    # and the RGB -3.7% regression both live outside this guard)
    assert refine_fused._DIRECT_MIN_WD >= 512
