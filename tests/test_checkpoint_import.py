"""PyTorch `.pth` -> Flax import parity.

The oracle is a *functional* torch forward (F.conv2d / F.batch_norm /
F.max_pool2d / F.interpolate driven directly by the state-dict tensors) over
the reference's checkpoint key schema (``unet.inc.double_conv.0.weight`` ...,
reference ``model/train.py:232-244``). A random state dict with the reference
architecture's exact shapes is built by name, run through both the oracle and
the imported Flax model, and outputs compared. This gates the
"SSIM within 0.005 of the PyTorch reference" target on identical weights.

Runs on the CPU backend: TPU default matmul precision is bf16-ish, which
would mask layout bugs behind rounding noise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ai_based_frame_interpolation_tpu.config import ModelConfig
from ai_based_frame_interpolation_tpu.models import FrameInterpolationUNet
from ai_based_frame_interpolation_tpu.train.checkpoint import (
    import_pth, import_state_dict)  # noqa: F401  (more imported in-test)

torch = pytest.importorskip("torch")

def enc_table(bilinear):
    # (prefix, in, mid, out) per DoubleConv; bottleneck is halved when bilinear
    bott = 512 if bilinear else 1024
    downs = [(64, 128), (128, 256), (256, 512), (512, bott)]
    return [("unet.inc.double_conv", 2, 64, 64)] + [
        (f"unet.down{k}.maxpool_conv.1.double_conv", i, o, o)
        for k, (i, o) in enumerate(downs, 1)]


DEC_BILINEAR = [
    (f"unet.up{k}.conv.double_conv", i, m, o)
    for k, (i, m, o) in enumerate([(1024, 512, 256), (512, 256, 128),
                                   (256, 128, 64), (128, 64, 64)], 1)]


def random_state_dict(rng, bilinear=True):
    sd = {}

    def add_double_conv(prefix, cin, mid, cout):
        # fan-in scaled so activations stay O(1) through 18 layers; otherwise
        # benign f32 reduction-order differences amplify into huge absolute
        # deltas by the decoder and the comparison is meaningless
        for idx, (i, o) in ((0, (cin, mid)), (3, (mid, cout))):
            sd[f"{prefix}.{idx}.weight"] = (rng.standard_normal(
                (o, i, 3, 3)) / np.sqrt(9 * i)).astype(np.float32)
        for idx, ch in ((1, mid), (4, cout)):
            sd[f"{prefix}.{idx}.weight"] = rng.uniform(0.6, 1.4, ch).astype(np.float32)
            sd[f"{prefix}.{idx}.bias"] = rng.standard_normal(ch).astype(np.float32) * 0.05
            sd[f"{prefix}.{idx}.running_mean"] = rng.standard_normal(ch).astype(np.float32) * 0.05
            sd[f"{prefix}.{idx}.running_var"] = rng.uniform(0.5, 1.5, ch).astype(np.float32)
            sd[f"{prefix}.{idx}.num_batches_tracked"] = np.array(10)

    for prefix, cin, mid, cout in enc_table(bilinear):
        add_double_conv(prefix, cin, mid, cout)
    if bilinear:
        for prefix, cin, mid, cout in DEC_BILINEAR:
            add_double_conv(prefix, cin, mid, cout)
    else:
        # Up(in, out): ConvTranspose(in -> in//2), concat skip -> in, DC(in, out)
        dec = [(1024, 512), (512, 256), (256, 128), (128, 64)]
        for k, (cin, cout) in enumerate(dec, 1):
            sd[f"unet.up{k}.up.weight"] = (rng.standard_normal(
                (cin, cin // 2, 2, 2)) / np.sqrt(4 * cin)).astype(np.float32)
            sd[f"unet.up{k}.up.bias"] = rng.standard_normal(cin // 2).astype(np.float32) * 0.05
            add_double_conv(f"unet.up{k}.conv.double_conv", cin, cout, cout)
    sd["unet.outc.conv.weight"] = (rng.standard_normal(
        (1, 64, 1, 1)) / 8.0).astype(np.float32)
    sd["unet.outc.conv.bias"] = rng.standard_normal(1).astype(np.float32) * 0.05
    return sd


def torch_functional_forward(sd, f1_nchw, f2_nchw, bilinear=True):
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def dc(prefix, x):
        for conv_i, bn_i in ((0, 1), (3, 4)):
            x = F.conv2d(x, t[f"{prefix}.{conv_i}.weight"], None, padding=1)
            x = F.batch_norm(x, t[f"{prefix}.{bn_i}.running_mean"],
                             t[f"{prefix}.{bn_i}.running_var"],
                             t[f"{prefix}.{bn_i}.weight"],
                             t[f"{prefix}.{bn_i}.bias"], False, 0.1, 1e-5)
            x = F.relu(x)
        return x

    x = torch.cat([torch.from_numpy(f1_nchw), torch.from_numpy(f2_nchw)], 1)
    skips = [dc("unet.inc.double_conv", x)]
    for k in range(1, 5):
        y = F.max_pool2d(skips[-1], 2)
        skips.append(dc(f"unet.down{k}.maxpool_conv.1.double_conv", y))
    y = skips[-1]
    for k in range(1, 5):
        if bilinear:
            y = F.interpolate(y, scale_factor=2, mode="bilinear",
                              align_corners=True)
        else:
            y = F.conv_transpose2d(y, t[f"unet.up{k}.up.weight"],
                                   t[f"unet.up{k}.up.bias"], stride=2)
        skip = skips[4 - k]
        dh, dw = skip.shape[2] - y.shape[2], skip.shape[3] - y.shape[3]
        if dh or dw:
            y = F.pad(y, [dw // 2, dw - dw // 2, dh // 2, dh - dh // 2])
        y = dc(f"unet.up{k}.conv.double_conv", torch.cat([skip, y], 1))
    out = F.conv2d(y, t["unet.outc.conv.weight"], t["unet.outc.conv.bias"])
    return out.numpy()


@pytest.mark.parametrize("bilinear", [True, False])
def test_import_forward_parity(rng, bilinear):
    sd = random_state_dict(rng, bilinear=bilinear)
    f1 = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    f2 = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = torch_functional_forward(sd, f1, f2, bilinear=bilinear)

    cfg = ModelConfig(bilinear=bilinear)
    variables = import_state_dict(
        {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")},
        cfg)
    model = FrameInterpolationUNet(cfg=cfg, compute_dtype=jnp.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out = jax.jit(lambda v, a, b: model.apply(v, a, b, train=False))(
            jax.device_put(variables, cpu),
            jnp.asarray(np.transpose(f1, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(f2, (0, 2, 3, 1))))
    ours = np.transpose(np.asarray(out), (0, 3, 1, 2))
    err = np.abs(ours - ref).max() / max(np.abs(ref).max(), 1e-3)
    assert err < 2e-3, (err, np.abs(ref).max())


def test_import_pth_file_roundtrip(rng, tmp_path):
    # the reference saves {'model_state_dict': ...} (model/train.py:232-244)
    sd = random_state_dict(rng)
    path = str(tmp_path / "best_model.pth")
    torch.save({"epoch": 3,
                "model_state_dict": {k: torch.from_numpy(np.asarray(v))
                                     for k, v in sd.items()},
                "train_loss": 0.1, "val_loss": 0.2}, path)
    variables = import_pth(path)
    kern = variables["params"]["unet"]["inc"]["conv1"]["kernel"]
    assert kern.shape == (3, 3, 2, 64)
    np.testing.assert_allclose(
        kern, np.transpose(sd["unet.inc.double_conv.0.weight"], (2, 3, 1, 0)))
    # raw state dicts (no wrapper) load too (model/inference.py:83-94)
    path2 = str(tmp_path / "raw.pth")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path2)
    variables2 = import_pth(path2)
    np.testing.assert_allclose(
        variables2["batch_stats"]["unet"]["inc"]["bn1"]["mean"],
        sd["unet.inc.double_conv.1.running_mean"])


def test_export_import_roundtrip(rng):
    from ai_based_frame_interpolation_tpu.train.checkpoint import (
        export_state_dict, import_state_dict)

    sd = random_state_dict(rng)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    variables = import_state_dict(sd, ModelConfig())
    back = export_state_dict(variables, ModelConfig())
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k], err_msg=k)


def test_export_pth_loads_in_torch_oracle(rng, tmp_path):
    # our exported .pth must drive the functional torch forward to the same
    # output as our own model — the cross-framework parity loop closed
    from ai_based_frame_interpolation_tpu.train.checkpoint import (
        export_pth, import_pth)

    sd = random_state_dict(rng)
    sd = {k: v for k, v in sd.items() if not k.endswith("num_batches_tracked")}
    variables = import_state_dict(sd, ModelConfig())
    path = str(tmp_path / "exported.pth")
    export_pth(path, variables, ModelConfig(), epoch=7)
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 7
    f1 = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    f2 = rng.standard_normal((1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_orig = torch_functional_forward(sd, f1, f2)
        out_exported = torch_functional_forward(
            {k: v.numpy() for k, v in loaded["model_state_dict"].items()},
            f1, f2)
    np.testing.assert_allclose(out_exported, out_orig, atol=1e-6)
