"""Checkpointing: Orbax save/restore + PyTorch ``.pth`` import for parity.

Capability superset of the reference (``model/train.py:232-244`` saves a
best-val ``best_model.pth`` dict; ``model/inference.py:65-99`` loads weights
only; **no resume path exists** — optimizer state is saved but never
reloaded, SURVEY.md §5):

- ``Checkpointer`` keeps ``latest/`` (every epoch, for true ``--resume``) and
  ``best/`` (val-loss policy, matching the reference's best-model contract),
  with params, batch stats, optimizer state, epoch, LR and full histories.
- ``import_pth`` converts a reference-format PyTorch checkpoint into this
  framework's variables (OIHW->HWIO kernel transposes, BN weight/bias ->
  scale/bias, running stats -> batch_stats) so TPU-vs-reference SSIM parity
  can be measured on identical weights.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from ..config import ModelConfig


# ---------------------------------------------------------------------------
# Orbax save/restore
# ---------------------------------------------------------------------------

def _tree_of(state) -> Dict[str, Any]:
    tree = {"step": state.step, "params": state.params,
            "batch_stats": state.batch_stats, "opt_state": state.opt_state}
    if getattr(state, "ema_params", ()) != ():   # saved only when EMA is on
        tree["ema_params"] = state.ema_params
    return tree


class Checkpointer:
    """Directory layout: ``<dir>/latest`` and ``<dir>/best`` (Orbax trees)
    plus ``<dir>/{latest,best}_meta.json`` (epoch, histories)."""

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _save_one(self, name: str, state, epoch: int, history) -> None:
        path = os.path.join(self.directory, name)
        self._ckptr.save(path, _tree_of(state), force=True)
        self._ckptr.wait_until_finished()   # StandardCheckpointer is async
        meta = {"epoch": epoch,
                "history": dataclasses.asdict(history) if history is not None
                else None}
        with open(os.path.join(self.directory, f"{name}_meta.json"), "w") as f:
            json.dump(meta, f)

    def save(self, state, epoch: int, history=None, best: bool = False,
             latest: bool = True) -> None:
        if latest:
            self._save_one("latest", state, epoch, history)
        if best:
            self._save_one("best", state, epoch, history)

    def restore(self, template_state, which: str = "best"):
        """Restore into the structure of ``template_state``.

        Returns (state, epoch, history_dict) — epoch is the NEXT epoch to run.
        """
        path = os.path.join(self.directory, which)
        if not os.path.exists(path):
            if which == "best":     # fall back: best never written yet
                path = os.path.join(self.directory, "latest")
                which = "latest"
        if not os.path.exists(path):
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        target = _tree_of(template_state)
        try:
            tree = self._ckptr.restore(path, target)
        except Exception:
            if "ema_params" not in target:
                raise
            # resuming a pre-EMA checkpoint with --ema-decay on: restore
            # without the EMA slot and seed it from the restored params
            tree = self._ckptr.restore(
                path, {k: v for k, v in target.items() if k != "ema_params"})
            tree["ema_params"] = jax.tree.map(lambda x: x.copy(),
                                              tree["params"])
        state = template_state.replace(**tree)
        meta_path = os.path.join(self.directory, f"{which}_meta.json")
        epoch, history = 0, None
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            epoch = int(meta.get("epoch", -1)) + 1
            history = meta.get("history")
        return state, epoch, history

    def has_checkpoint(self, which: str = "latest") -> bool:
        return os.path.exists(os.path.join(self.directory, which))


def save_variables(directory: str, variables, cfg: Optional[ModelConfig] = None):
    """Save inference-only variables ({params, batch_stats}) + model config."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(directory, "variables"),
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        force=True)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(os.path.join(directory, "model_config.json"), "w") as f:
            json.dump(dataclasses.asdict(cfg), f)


def load_variables(directory: str, template=None):
    """Load inference variables; returns (variables, ModelConfig or None)."""
    import orbax.checkpoint as ocp

    directory = os.path.abspath(directory)
    cfg = None
    cfg_path = os.path.join(directory, "model_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = ModelConfig(**json.load(f))
    path = os.path.join(directory, "variables")
    try:
        if template is not None:
            tmpl = {"params": template["params"],
                    "batch_stats": template["batch_stats"]}
            tree = ocp.StandardCheckpointer().restore(path, tmpl)
        else:
            tree = ocp.StandardCheckpointer().restore(path)
    except ValueError:
        # saved-device sharding doesn't exist here (e.g. a TPU-trained
        # checkpoint loaded in a CPU-only process): restore to host numpy;
        # callers device_put / jit-commit as usual
        tree = _restore_numpy(path)
    return tree, cfg


def _restore_numpy(path: str):
    """Device-agnostic restore: every leaf comes back as ``np.ndarray``."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    meta_tree = ckptr.metadata(path).item_metadata.tree
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
    return ckptr.restore(path, restore_args=restore_args)


# ---------------------------------------------------------------------------
# PyTorch .pth import (reference checkpoint format)
# ---------------------------------------------------------------------------

def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))          # OIHW -> HWIO


def _convtranspose_kernel(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d weight is (in, out, kh, kw) and is applied
    # spatially *flipped* relative to flax's ConvTranspose (verified exact
    # on CPU): flip kh/kw, then IOHW -> HWIO.
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


def _double_conv_entries(prefix_t: str, path: Tuple[str, ...], sd, params,
                         batch_stats) -> None:
    """Map one torch DoubleConv (Sequential indices 0,1,3,4) into the tree."""
    for idx, name in ((0, "conv1"), (3, "conv2")):
        params[path + (name,)] = {
            "kernel": _conv_kernel(sd[f"{prefix_t}.{idx}.weight"])}
    for idx, name in ((1, "bn1"), (4, "bn2")):
        params[path + (name,)] = {
            "scale": sd[f"{prefix_t}.{idx}.weight"],
            "bias": sd[f"{prefix_t}.{idx}.bias"]}
        batch_stats[path + (name,)] = {
            "mean": sd[f"{prefix_t}.{idx}.running_mean"],
            "var": sd[f"{prefix_t}.{idx}.running_var"]}


def import_pth(path: str, cfg: Optional[ModelConfig] = None):
    """Convert a reference-format ``.pth`` into {params, batch_stats}.

    Accepts the reference's checkpoint dict ({'model_state_dict': ...},
    ``model/train.py:232-244``) or a raw state dict, mirroring the tolerant
    loader at ``model/inference.py:83-94``. Infers ``bilinear`` from the
    presence of transposed-conv keys when ``cfg`` is not given.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if not k.endswith("num_batches_tracked")}
    return import_state_dict(sd, cfg)


def import_state_dict(sd: Dict[str, np.ndarray],
                      cfg: Optional[ModelConfig] = None):
    """Core name/layout mapping from torch state-dict arrays to Flax trees."""
    bilinear = not any(".up.weight" in k for k in sd) if cfg is None \
        else cfg.bilinear
    depth = 4 if cfg is None else cfg.depth

    flat_params: Dict[Tuple[str, ...], Any] = {}
    flat_stats: Dict[Tuple[str, ...], Any] = {}

    _double_conv_entries("unet.inc.double_conv", ("unet", "inc"),
                         sd, flat_params, flat_stats)
    for k in range(1, depth + 1):
        _double_conv_entries(f"unet.down{k}.maxpool_conv.1.double_conv",
                             ("unet", f"down{k}", "conv"),
                             sd, flat_params, flat_stats)
        _double_conv_entries(f"unet.up{k}.conv.double_conv",
                             ("unet", f"up{k}", "conv"),
                             sd, flat_params, flat_stats)
        if not bilinear:
            flat_params[("unet", f"up{k}", "up")] = {
                "kernel": _convtranspose_kernel(sd[f"unet.up{k}.up.weight"]),
                "bias": sd[f"unet.up{k}.up.bias"]}
    flat_params[("unet", "outc")] = {
        "kernel": _conv_kernel(sd["unet.outc.conv.weight"]),
        "bias": sd["unet.outc.conv.bias"]}

    def unflatten(flat):
        tree: Dict[str, Any] = {}
        for path, leaves in flat.items():
            node = tree
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = {k: np.asarray(v) for k, v in leaves.items()}
        return tree

    return {"params": unflatten(flat_params),
            "batch_stats": unflatten(flat_stats)}


# ---------------------------------------------------------------------------
# Export to the reference's .pth key schema (the inverse of import_state_dict)
# ---------------------------------------------------------------------------

def export_state_dict(variables, cfg: Optional[ModelConfig] = None
                      ) -> Dict[str, np.ndarray]:
    """Flax variables -> reference-format state-dict arrays.

    Inverse of :func:`import_state_dict` (HWIO->OIHW etc.), so weights
    trained in this framework can run inside the PyTorch reference — that is
    how the TPU-vs-reference SSIM delta is measured on shared weights.
    Round-trip tested in ``tests/test_checkpoint_import.py``.
    """
    import jax

    cfg = cfg or ModelConfig()
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables.get("batch_stats", {}))
    sd: Dict[str, np.ndarray] = {}

    def put_double_conv(prefix_t, p_node, s_node):
        for idx, name in ((0, "conv1"), (3, "conv2")):
            sd[f"{prefix_t}.{idx}.weight"] = np.transpose(
                p_node[name]["kernel"], (3, 2, 0, 1))       # HWIO -> OIHW
        for idx, name in ((1, "bn1"), (4, "bn2")):
            sd[f"{prefix_t}.{idx}.weight"] = p_node[name]["scale"]
            sd[f"{prefix_t}.{idx}.bias"] = p_node[name]["bias"]
            sd[f"{prefix_t}.{idx}.running_mean"] = s_node[name]["mean"]
            sd[f"{prefix_t}.{idx}.running_var"] = s_node[name]["var"]

    unet_p = params["unet"]
    unet_s = stats["unet"]
    put_double_conv("unet.inc.double_conv", unet_p["inc"], unet_s["inc"])
    for k in range(1, cfg.depth + 1):
        put_double_conv(f"unet.down{k}.maxpool_conv.1.double_conv",
                        unet_p[f"down{k}"]["conv"], unet_s[f"down{k}"]["conv"])
        put_double_conv(f"unet.up{k}.conv.double_conv",
                        unet_p[f"up{k}"]["conv"], unet_s[f"up{k}"]["conv"])
        if not cfg.bilinear:
            kern = unet_p[f"up{k}"]["up"]["kernel"]         # HWIO
            sd[f"unet.up{k}.up.weight"] = np.ascontiguousarray(
                np.transpose(kern, (2, 3, 0, 1))[:, :, ::-1, ::-1])
            sd[f"unet.up{k}.up.bias"] = unet_p[f"up{k}"]["up"]["bias"]
    sd["unet.outc.conv.weight"] = np.transpose(unet_p["outc"]["kernel"],
                                               (3, 2, 0, 1))
    sd["unet.outc.conv.bias"] = unet_p["outc"]["bias"]
    return sd


def export_pth(path: str, variables, cfg: Optional[ModelConfig] = None,
               epoch: int = 0, train_loss: float = 0.0,
               val_loss: float = 0.0) -> str:
    """Write a reference-compatible ``best_model.pth`` checkpoint dict
    (shape of reference ``model/train.py:232-244``)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(variables, cfg).items()}
    torch.save({"epoch": epoch, "model_state_dict": sd,
                "train_loss": train_loss, "val_loss": val_loss}, path)
    return path
