"""The BASELINE.md quality gate: SSIM within 0.005 of the PyTorch reference
on identical weights.

Loads one set of reference-format weights into BOTH implementations (the
functional-torch oracle over the reference's exact compute graph, and our
engine), interpolates the same real frame pairs, and compares: (a) the SSIM
each output scores against ground truth must agree within 0.005, and (b) the
two outputs must be near-identical to each other. Runs in f32 on the CPU
backend so the delta measures implementation parity, not bf16 rounding.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.data.synthetic import moving_circle_frames
from ai_based_frame_interpolation_tpu.infer.engine import InterpolationEngine
from ai_based_frame_interpolation_tpu.models.unet import FrameInterpolationUNet
from ai_based_frame_interpolation_tpu.ops.ssim import ssim_eval
from ai_based_frame_interpolation_tpu.train.checkpoint import import_state_dict

torch = pytest.importorskip("torch")


def _torch_midpoint_u8(sd, f0_u8, f1_u8):
    """The reference inference path on the oracle graph: [-1,1] normalize,
    forward, denormalize to uint8 (reference model/inference.py:11-63)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "tci", os.path.join(os.path.dirname(__file__),
                            "test_checkpoint_import.py"))
    tci = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tci)

    def norm(u8):
        x = u8.astype(np.float32)[None, None, :, :, 0] / 255.0
        return x * 2.0 - 1.0

    with torch.no_grad():
        out = tci.torch_functional_forward(sd, norm(f0_u8), norm(f1_u8))
    y = np.clip((out[0, 0] + 1.0) * 0.5, 0.0, 1.0) * 255.0
    return np.round(y).astype(np.uint8)[..., None]


def test_ssim_delta_vs_reference_under_0005(rng):
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "tci", os.path.join(os.path.dirname(__file__),
                            "test_checkpoint_import.py"))
    tci = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tci)

    sd = tci.random_state_dict(rng)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    variables = import_state_dict(sd, ModelConfig())

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        model = FrameInterpolationUNet(cfg=ModelConfig(),
                                       compute_dtype=jnp.float32)
        engine = InterpolationEngine(model, jax.device_put(variables, cpu),
                                     compute_dtype=jnp.float32)

        frames = moving_circle_frames(5, 64, 64, radius=16, step=6, noise=4)
        deltas, cross = [], []
        for i in range(3):
            f0, gt, f1 = frames[i], frames[i + 1], frames[i + 2]
            ours = engine.interpolate_pair(f0, f1)
            theirs = _torch_midpoint_u8(sd, f0, f1)
            ssim_ours = float(ssim_eval(jnp.asarray(ours), jnp.asarray(gt)))
            ssim_theirs = float(ssim_eval(jnp.asarray(theirs),
                                          jnp.asarray(gt)))
            deltas.append(abs(ssim_ours - ssim_theirs))
            cross.append(float(ssim_eval(jnp.asarray(ours),
                                         jnp.asarray(theirs))))
    # BASELINE.md target: SSIM within 0.005 of the PyTorch reference
    assert max(deltas) < 0.005, deltas
    # and the outputs themselves are essentially the same image
    assert min(cross) > 0.995, cross
