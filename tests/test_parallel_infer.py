"""SPMD inference: batch- and spatial-sharded engines must match single-device."""

import jax
import numpy as np
import pytest

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.models.unet import FrameInterpolationUNet
from ai_based_frame_interpolation_tpu.parallel.mesh import make_mesh
from ai_based_frame_interpolation_tpu.parallel.sharding import (
    choose_spec, put_frames, spatial_spec)

TINY = ModelConfig(base_width=4)


@pytest.fixture(scope="module")
def cpu_mesh():
    return make_mesh(devices=jax.devices("cpu"))


@pytest.fixture(scope="module")
def engines(cpu_mesh):
    import jax.numpy as jnp

    model = FrameInterpolationUNet(cfg=TINY)
    f = jnp.zeros((1, 64, 64, 1), jnp.float32)
    v = jax.jit(lambda a, b: model.init(jax.random.key(0), a, b,
                                        train=False))(f, f)
    cpu = jax.devices("cpu")[0]
    v_cpu = jax.device_put(v, cpu)
    with jax.default_device(cpu):
        single = InterpolationEngine(model, v_cpu)
        meshed = InterpolationEngine(
            FrameInterpolationUNet(cfg=TINY), v_cpu, mesh=cpu_mesh)
    return single, meshed


def test_choose_spec(cpu_mesh):
    assert choose_spec(16, 64, cpu_mesh) == jax.sharding.PartitionSpec("data")
    # batch 1 doesn't divide 8 devices -> spatial H sharding
    assert choose_spec(1, 64, cpu_mesh) == \
        jax.sharding.PartitionSpec(None, "data")
    # nothing divides -> replicate
    assert choose_spec(3, 65, cpu_mesh) == jax.sharding.PartitionSpec()


def test_put_frames_shards_batch(cpu_mesh, rng):
    arr = rng.integers(0, 255, (8, 64, 64, 1), np.uint8)
    out = put_frames(arr, cpu_mesh)
    assert not out.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(out), arr)


def test_batch_sharded_inference_matches(engines, rng):
    single, meshed = engines
    f1 = rng.integers(0, 255, (8, 64, 64, 1), np.uint8)
    f2 = rng.integers(0, 255, (8, 64, 64, 1), np.uint8)
    a = single.interpolate_batch(f1, f2)
    b = meshed.interpolate_batch(f1, f2)
    np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)


def test_spatial_sharded_inference_matches(engines, rng):
    # batch 1 -> H sharded over 8 devices; conv halo exchange must make the
    # result identical to the single-device run
    single, meshed = engines
    f1 = rng.integers(0, 255, (64, 64, 1), np.uint8)
    f2 = rng.integers(0, 255, (64, 64, 1), np.uint8)
    a = single.interpolate_pair(f1, f2)
    b = meshed.interpolate_pair(f1, f2)
    np.testing.assert_allclose(a.astype(int), b.astype(int), atol=1)


@pytest.fixture(scope="module")
def flow_engines(cpu_mesh):
    import jax.numpy as jnp

    from ai_based_frame_interpolation_tpu.models import build_model

    cfg = ModelConfig(arch="flow", base_width=4, flow_scale=2)
    model = build_model(cfg, jnp.float32)
    f = jnp.zeros((1, 64, 64, 1), jnp.float32)
    v = jax.jit(lambda a, b: model.init(jax.random.key(0), a, b,
                                        train=False))(f, f)
    cpu = jax.devices("cpu")[0]
    v_cpu = jax.device_put(v, cpu)
    with jax.default_device(cpu):
        single = InterpolationEngine(build_model(cfg, jnp.float32), v_cpu)
        meshed = InterpolationEngine(build_model(cfg, jnp.float32), v_cpu,
                                     mesh=cpu_mesh)
    return single, meshed


def _assert_flow_close(a, b):
    """Flow-family cross-program tolerance: with warp_impl="shifts" (the
    default) the warp selects among 2*max_flow+2 shifted terms by per-pixel
    integer offsets derived from the f32 field; two differently-compiled
    programs (single vs sharded) reassociate the backbone's reductions, and
    where the field sits within f32 noise of an integer the selected offset
    pair flips — the blended result stays within 2 uint8 LSB, but exceeds
    the 1-LSB wobble of select-free models on a handful of pixels
    (measured 2/32768)."""
    diff = np.abs(a.astype(int) - b.astype(int))
    assert diff.max() <= 2, f"max uint8 diff {diff.max()}"
    frac_over_1 = float((diff > 1).mean())
    assert frac_over_1 <= 1e-3, f"{frac_over_1:.2%} of pixels differ by 2"


def test_flow_batch_sharded_inference_matches(flow_engines, rng):
    """The flow family (motion backbone + warp + blend) under DP
    sharding: per-example independence makes batch sharding exact."""
    single, meshed = flow_engines
    f1 = rng.integers(0, 255, (8, 64, 64, 1), np.uint8)
    f2 = rng.integers(0, 255, (8, 64, 64, 1), np.uint8)
    a = single.interpolate_batch(f1, f2)
    b = meshed.interpolate_batch(f1, f2)
    _assert_flow_close(a, b)


def test_flow_spatial_sharded_inference_matches(flow_engines, rng):
    """H-sharded flow inference: the warp's shifted slices cross shard
    boundaries (flow can point anywhere within max_flow) — XLA's SPMD
    partitioner must insert the halo collectives; the result must still
    match single-device up to the flow cross-program tolerance."""
    single, meshed = flow_engines
    f1 = rng.integers(0, 255, (64, 64, 1), np.uint8)
    f2 = rng.integers(0, 255, (64, 64, 1), np.uint8)
    a = single.interpolate_pair(f1, f2)
    b = meshed.interpolate_pair(f1, f2)
    _assert_flow_close(a, b)
