"""Fused Pallas refinement head vs the Flax/XLA branch.

Interpret-mode tests pin the kernel's tiling/halo/border math against the
model's own refine branch (``models/unet.py:236-254``) on CPU; the compiled
path is exercised engine-level on the session accelerator (uint8 output
parity — bf16 accumulation order differs between the two programs, so the
tolerance is the usual cross-program atol=1 plus a tiny outlier budget).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.models import build_model
from ai_based_frame_interpolation_tpu.ops.pallas.refine_fused import (
    eligible, refine_head_fused)

CPU = jax.devices("cpu")[0]


def _setup(rng, cfg, h, w, batch=2, channels=1):
    model = build_model(cfg, jnp.bfloat16)
    f1 = jnp.asarray(rng.uniform(-1, 1, (batch, h, w, channels))
                     .astype(np.float32))
    f2 = jnp.asarray(rng.uniform(-1, 1, (batch, h, w, channels))
                     .astype(np.float32))
    variables = jax.jit(
        lambda a, b: model.init(jax.random.key(0), a, b, train=False))(f1, f1)
    return model, variables, f1, f2


def _compare(rng, cfg, h, w, batch=2, channels=1):
    model, variables, f1, f2 = _setup(rng, cfg, h, w, batch, channels)
    full = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
        variables, f1, f2)
    y = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False,
                                            skip_refine=True))(
        variables, f1, f2)
    p = variables["params"]
    planes = (f1.astype(jnp.bfloat16), f2.astype(jnp.bfloat16))
    if getattr(cfg, "refine_depthwise", False):
        fused = refine_head_fused(y.astype(jnp.float32), planes,
                                  p["refine1"], None, p["refine_out"],
                                  refine2_dw=p["refine2_dw"],
                                  refine2_pw=p["refine2_pw"],
                                  interpret=True)
    else:
        fused = refine_head_fused(y.astype(jnp.float32), planes,
                                  p["refine1"], p["refine2"], p["refine_out"],
                                  interpret=True)
    a = np.asarray(fused, np.float32)
    b = np.asarray(full, np.float32)
    # the kernel splits conv1 into three per-kx matmuls, so f32 summation
    # order differs from XLA's single conv: allow 1-ulp bf16 flips on a
    # fraction of pixels, exactness on the rest
    np.testing.assert_allclose(a, b, atol=1.2e-2)
    assert float((a == b).mean()) > 0.99


def test_interpret_matches_xla_refine(rng):
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=8,
                                  residual=True), 64, 96)


def test_interpret_width64_tap_packing(rng):
    # width 64 exercises the production pack-2 conv2 grouping (9 taps ->
    # 4 pairs + a zero-padded single)
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=64),
                 32, 64, batch=1)


def test_interpret_multi_col_tiles(rng):
    # w=272 exercises a padded (non-native-width) lane layout; h=48 => 3
    # row tiles on the th=16 path
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=8), 48, 272)


def test_interpret_th8_fallback(rng):
    # h=40 is 8-row-tileable but not 16 => the th=8 tile path
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=8), 40, 64)


def test_interpret_rgb(rng):
    # channels=3: 9 input planes, 81-deep conv1 pass, per-channel output
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=8,
                                  channels=3, residual=True), 32, 64,
                 batch=1, channels=3)


def test_interpret_rgb_depthwise(rng):
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=16,
                                  channels=3, refine_depthwise=True), 32, 64,
                 batch=1, channels=3)


def test_interpret_depthwise_head(rng):
    # separable conv2: VPU depthwise via output-roll + single pointwise
    # matmul; parity vs the Flax refine_depthwise branch
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=16,
                                  refine_depthwise=True, residual=True),
                 32, 64, batch=1)


def test_interpret_depthwise_w64(rng):
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=64,
                                  refine_depthwise=True), 32, 64, batch=1)


def test_engine_routes_rgb(rng):
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    cfg = ModelConfig(space_to_depth=2, refine_width=8, base_width=4,
                      channels=3, residual=True)
    auto = InterpolationEngine.random_init(cfg)
    xla = InterpolationEngine(auto.model, auto.variables, fold=False,
                              refine_impl="xla")
    f1 = rng.integers(0, 255, (96, 160, 3), np.uint8)
    f2 = rng.integers(0, 255, (96, 160, 3), np.uint8)
    a = auto.interpolate_pair(f1, f2).astype(np.int16)
    b = xla.interpolate_pair(f1, f2).astype(np.int16)
    d = np.abs(a - b)
    assert float((d <= 1).mean()) > 0.999, float((d <= 1).mean())
    assert int(d.max()) <= 3, int(d.max())


def test_engine_routes_depthwise(rng):
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    cfg = ModelConfig(space_to_depth=2, refine_width=16, base_width=4,
                      residual=True, refine_depthwise=True)
    auto = InterpolationEngine.random_init(cfg)
    xla = InterpolationEngine(auto.model, auto.variables, fold=False,
                              refine_impl="xla")
    f1 = rng.integers(0, 255, (96, 160, 1), np.uint8)
    f2 = rng.integers(0, 255, (96, 160, 1), np.uint8)
    a = auto.interpolate_pair(f1, f2).astype(np.int16)
    b = xla.interpolate_pair(f1, f2).astype(np.int16)
    d = np.abs(a - b)
    assert float((d <= 1).mean()) > 0.999, float((d <= 1).mean())
    assert int(d.max()) <= 3, int(d.max())


def test_eligibility_gate():
    cfg = ModelConfig(space_to_depth=4, refine_width=64)
    assert eligible((2, 1088, 1920, 1), cfg)
    assert eligible((1, 256, 256, 1), cfg)
    assert not eligible((1, 1084, 1920, 1), cfg)      # H % 8 != 0
    assert not eligible((1, 256, 256, 3), cfg)        # channel mismatch
    assert eligible((1, 256, 256, 3),
                    ModelConfig(space_to_depth=4, refine_width=64,
                                channels=3))          # RGB eligible
    assert not eligible((2, 1088, 1920, 1), ModelConfig())  # no refine head
    assert not eligible(
        (2, 1088, 1920, 1),
        ModelConfig(space_to_depth=4, refine_width=64, refine_factor=2))


def test_engine_routes_and_matches_xla(rng):
    """Engine-level parity on the session accelerator: the auto engine (fused
    kernel on TPU) and the forced-XLA engine must produce the same uint8
    frames. On CPU hosts both engines take the XLA path and match exactly."""
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    cfg = ModelConfig(space_to_depth=2, refine_width=16, base_width=4,
                      residual=True)
    auto = InterpolationEngine.random_init(cfg)
    xla = InterpolationEngine(auto.model, auto.variables, fold=False,
                              refine_impl="xla")
    f1 = rng.integers(0, 255, (96, 160, 1), np.uint8)
    f2 = rng.integers(0, 255, (96, 160, 1), np.uint8)
    a = auto.interpolate_pair(f1, f2).astype(np.int16)
    b = xla.interpolate_pair(f1, f2).astype(np.int16)
    d = np.abs(a - b)
    # cross-program bf16 reassociation budget: atol 1 for 99.9% of pixels
    assert float((d <= 1).mean()) > 0.999, float((d <= 1).mean())
    assert int(d.max()) <= 3, int(d.max())


def test_interpret_flow_head_five_planes(rng):
    """The flow family's refine head (5 input planes: out/g0/g1/f1/f2,
    models/flow.py:refine) through the generalized kernel vs the Flax
    method."""
    with jax.default_device(CPU):
        cfg = ModelConfig(arch="flow", base_width=4, refine_width=8,
                          max_flow=8)
        model = build_model(cfg, jnp.bfloat16)
        b, h, w = 2, 48, 96
        f1 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        f2 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        variables = jax.jit(lambda a, c: model.init(
            jax.random.key(0), a, c, train=False))(f1, f2)
        g0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        g1 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        out = 0.5 * (g0 + g1)
        ref = jax.jit(lambda v: model.apply(v, out, g0, g1, f1, f2,
                                            method="refine"))(variables)
        p = variables["params"]
        fused = refine_head_fused(out, (g0, g1, f1, f2), p["refine1"],
                                  p["refine2"], p["refine_out"],
                                  interpret=True)
        a = np.asarray(fused, np.float32)
        # the Flax flow refine returns f32; the engine casts to the compute
        # dtype right after — compare at that precision (the kernel's
        # output dtype)
        r = np.asarray(ref.astype(jnp.bfloat16), np.float32)
        np.testing.assert_allclose(a, r, atol=1.2e-2)
        assert float((a == r).mean()) > 0.99


def test_flow_eligibility():
    assert eligible((1, 64, 128, 1), ModelConfig(arch="flow",
                                                 refine_width=16))
    assert not eligible((1, 64, 128, 1), ModelConfig(arch="flow"))
    assert not eligible((1, 64, 128, 1), ModelConfig(arch="tower",
                                                     refine_width=16))


def test_engine_forced_pallas_unet_on_cpu(rng):
    """refine_impl="pallas" forces the fused head (interpret mode) off-TPU
    — engine-level parity with the XLA route on any host."""
    from ai_based_frame_interpolation_tpu.infer.engine import (
        InterpolationEngine)

    cfg = ModelConfig(space_to_depth=2, refine_width=8, base_width=4,
                      residual=True)
    forced = InterpolationEngine.random_init(cfg)
    forced.refine_impl = "pallas"
    xla = InterpolationEngine(forced.model, forced.variables, fold=False,
                              refine_impl="xla")
    f1 = rng.integers(0, 255, (96, 160, 1), np.uint8)
    f2 = rng.integers(0, 255, (96, 160, 1), np.uint8)
    a = forced.interpolate_pair(f1, f2).astype(np.int16)
    b = xla.interpolate_pair(f1, f2).astype(np.int16)
    d = np.abs(a - b)
    assert float((d <= 1).mean()) > 0.999, float((d <= 1).mean())
    assert int(d.max()) <= 3, int(d.max())


# ---- direct NHWC mode (lane-multiple width: no caller prep chain) ----
# The production gates are gray + wd >= 512 (docs/PERF.md round 4: the
# compiled kernel miscomputes at wd < 512 and RGB direct measured -3.7%);
# interpret mode has neither problem, so these tests widen the gates to
# keep the kernel path covered at small shapes.


import pytest as _pytest


@_pytest.fixture
def direct_gates():
    import ai_based_frame_interpolation_tpu.ops.pallas.refine_fused as rf
    old = (rf._DIRECT, rf._DIRECT_MIN_WD, rf._DIRECT_CH)
    rf._DIRECT, rf._DIRECT_MIN_WD, rf._DIRECT_CH = True, 128, (1, 3)
    yield
    rf._DIRECT, rf._DIRECT_MIN_WD, rf._DIRECT_CH = old

def test_interpret_direct_multi_tile(rng, direct_gates):
    # wd=128 routes to the direct NHWC path; h=48 => 3 tiles on th=16,
    # exercising top/body/bottom halo DMAs and the border-row zeroing
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=8,
                                  residual=True), 48, 128)


def test_interpret_direct_w64_tap_packing(rng, direct_gates):
    # production head width through the direct path (pack-2 conv2 with
    # circular-rotate taps + wrap masks)
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=64),
                 32, 128, batch=1)


def test_interpret_direct_th8(rng, direct_gates):
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=8), 40, 128)


def test_interpret_direct_depthwise(rng, direct_gates):
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=16,
                                  refine_depthwise=True), 32, 128, batch=1)


def test_interpret_direct_wide(rng, direct_gates):
    # two lane groups (wd=256): the circular wrap masks only touch the
    # true frame edge lanes (0 and wd-1), not the 128-lane seam
    with jax.default_device(CPU):
        _compare(rng, ModelConfig(space_to_depth=2, refine_width=8), 32, 256,
                 batch=1)


def test_interpret_direct_flow_planes(rng, direct_gates):
    """Flow head (5 planes) through the direct path at wd=128."""
    with jax.default_device(CPU):
        cfg = ModelConfig(arch="flow", base_width=4, refine_width=8,
                          max_flow=8)
        model = build_model(cfg, jnp.bfloat16)
        b, h, w = 2, 32, 128
        f1 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        f2 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        variables = jax.jit(lambda a, c: model.init(
            jax.random.key(0), a, c, train=False))(f1, f2)
        g0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        g1 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 1)), jnp.float32)
        out = 0.5 * (g0 + g1)
        ref = jax.jit(lambda v: model.apply(v, out, g0, g1, f1, f2,
                                            method="refine"))(variables)
        p = variables["params"]
        fused = refine_head_fused(out, (g0, g1, f1, f2), p["refine1"],
                                  p["refine2"], p["refine_out"],
                                  interpret=True)
        a = np.asarray(fused, np.float32)
        r = np.asarray(ref.astype(jnp.bfloat16), np.float32)
        np.testing.assert_allclose(a, r, atol=1.2e-2)
        assert float((a == r).mean()) > 0.99


def test_interpret_direct_rgb(rng, direct_gates):
    # RGB through the direct path (round-4: per-channel plane DMAs, ch
    # f32 prediction scratch planes as residual bases)
    _compare(rng, ModelConfig(space_to_depth=2, refine_width=8,
                              channels=3, residual=True), 48, 128,
             batch=1, channels=3)


def test_interpret_direct_rgb_depthwise(rng, direct_gates):
    _compare(rng, ModelConfig(space_to_depth=2, refine_width=8,
                              channels=3, refine_depthwise=True), 32, 128,
             batch=1, channels=3)
