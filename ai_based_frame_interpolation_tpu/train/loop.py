"""SPMD training loop: jit train/eval steps over a data-parallel mesh.

Re-implements the capability of the reference trainer
(``model/train.py:153-316``: Adam lr=1e-4, combined 0.5*MSE+0.5*(1-SSIM)
loss, ReduceLROnPlateau(factor=0.5, patience=10), best-val checkpointing)
the TPU way:

- the train step is a single jitted function over a ``Mesh('data')``; the
  batch arrives sharded on its leading axis, params/opt-state replicated, and
  XLA inserts the gradient all-reduce over ICI (no hand-written collectives);
- BatchNorm batch statistics are computed over the **global** batch for free:
  under jit, ``mean`` over the sharded axis is a cross-device reduction —
  the TPU-native SyncBatchNorm;
- plateau LR control is host-side at epoch boundaries via
  ``optax.inject_hyperparams`` (a scalar push, not a recompile);
- per-step NaN guard (``jnp.isfinite`` on the loss) instead of silent
  divergence;
- true ``--resume`` support: optimizer state, epoch, histories and RNG key
  all checkpoint (the reference saves optimizer state but never reloads it —
  SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..config import LossConfig, TrainConfig
from ..models.unet import FrameInterpolationUNet
from ..ops.image import normalize_uint8
from ..ops.psnr import psnr
from ..ops.ssim import combined_loss, ssim_eval
from ..ops.warp import backward_warp
from ..parallel.mesh import make_mesh, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    # static fields
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # EMA of params (TrainConfig.ema_decay > 0); an empty tuple when off so
    # the pytree cost is zero and checkpoints stay small
    ema_params: Any = ()


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with an injectable learning rate (plateau control from the host)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate)


def _seed_ema(x):
    # train_step donates the state, so `variables` may hold deleted buffers
    # when this builds a checkpoint-restore template; values are then
    # irrelevant (restore overwrites them) but reads would crash
    if getattr(x, "is_deleted", None) is not None and x.is_deleted():
        return jnp.zeros_like(x)
    return jnp.copy(x)


def create_train_state(model: FrameInterpolationUNet, variables,
                       cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    ema = (jax.tree.map(_seed_ema, variables["params"])
           if cfg.ema_decay > 0 else ())
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=tx.init(variables["params"]),
                      apply_fn=model.apply, tx=tx, ema_params=ema)


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Host-side LR override (plateau schedule) without recompilation."""
    opt_state = state.opt_state
    hyper = dict(opt_state.hyperparams)
    hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state._replace(hyperparams=hyper))


def get_learning_rate(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def flow_smoothness(flow: jax.Array, img: jax.Array,
                    edge_scale: float = 10.0) -> jax.Array:
    """Edge-aware first-order smoothness of a motion field.

    The standard unsupervised-optical-flow regularizer: mean |d flow/dx| +
    |d flow/dy|, downweighted across image edges by exp(-edge_scale * |dI|)
    so motion boundaries (which coincide with image edges) are not
    penalized. ``img`` in [-1, 1]; ``flow`` in pixels, f32.
    """
    f = flow.astype(jnp.float32)
    i = img.astype(jnp.float32)
    d_ix = jnp.mean(jnp.abs(i[:, :, 1:] - i[:, :, :-1]), -1, keepdims=True)
    d_iy = jnp.mean(jnp.abs(i[:, 1:] - i[:, :-1]), -1, keepdims=True)
    d_fx = jnp.abs(f[:, :, 1:] - f[:, :, :-1])
    d_fy = jnp.abs(f[:, 1:] - f[:, :-1])
    return (jnp.mean(jnp.exp(-edge_scale * d_ix) * d_fx) +
            jnp.mean(jnp.exp(-edge_scale * d_iy) * d_fy))


def _loss_and_updates(params, batch_stats, apply_fn, batch, loss_cfg: LossConfig):
    f0 = normalize_uint8(batch["f0"])
    f1 = normalize_uint8(batch["f1"])
    gt = normalize_uint8(batch["gt"])
    pred, mutated = apply_fn({"params": params, "batch_stats": batch_stats},
                             f0, f1, train=True,
                             mutable=["batch_stats", "intermediates"])
    loss = combined_loss(pred, gt, loss_cfg.mse_weight, loss_cfg.ssim_weight,
                         loss_cfg.ssim_window, loss_cfg.ssim_sigma)
    if loss_cfg.census_weight > 0:
        from ..ops.census import census_loss

        loss = loss + loss_cfg.census_weight * census_loss(
            pred, gt, loss_cfg.census_window)
    inter = mutated.get("intermediates", {})
    if loss_cfg.flow_smooth_weight > 0 and "flow" in inter:
        loss = loss + loss_cfg.flow_smooth_weight * flow_smoothness(
            inter["flow"][0], 0.5 * (f0 + f1), loss_cfg.flow_smooth_edge)
    if loss_cfg.flow_photo_weight > 0 and "flow" in inter:
        # endpoint photometric grounding of the field (config.py:
        # flow_photo_weight): the t=1 warp field is F10 (or -F01 single-
        # field) and must carry f0 onto f1; the t=0 field is F01 and must
        # carry f1 onto f0 — exactly the sampler's own endpoint limits
        # (models/flow.py:sample), so no new conventions are introduced.
        fl = inter["flow"][0].astype(jnp.float32)
        f01 = fl[..., :2]
        f10 = fl[..., 2:4] if fl.shape[-1] == 4 else -f01
        r1 = backward_warp(f0.astype(jnp.float32), f10)
        r0 = backward_warp(f1.astype(jnp.float32), f01)
        loss = loss + loss_cfg.flow_photo_weight * (
            jnp.mean(jnp.abs(r1 - f1.astype(jnp.float32))) +
            jnp.mean(jnp.abs(r0 - f0.astype(jnp.float32))))
    return loss, mutated["batch_stats"]


def _accumulated_grads(params, batch_stats, apply_fn, batch, loss_cfg,
                       grad_accum: int):
    """Mean loss/grads over ``grad_accum`` sequential microbatches.

    ``lax.scan`` re-materializes activations per microbatch, so peak
    activation memory drops ~grad_accum x for the same effective batch —
    the TPU-idiomatic way to train at resolutions/batches that don't fit
    (the optimizer state and the plateau-LR host control are untouched).
    BatchNorm statistics update sequentially per microbatch, exactly as if
    the microbatches were separate steps.
    """
    def micro(carry, mb):
        stats, gsum, lsum = carry
        (loss, new_stats), g = jax.value_and_grad(
            _loss_and_updates, has_aux=True)(
            params, stats, apply_fn, mb, loss_cfg)
        gsum = jax.tree.map(jnp.add, gsum, g)
        return (new_stats, gsum, lsum + loss), None

    mbs = jax.tree.map(
        lambda x: x.reshape(grad_accum, x.shape[0] // grad_accum,
                            *x.shape[1:]), batch)
    zero_g = jax.tree.map(jnp.zeros_like, params)
    (new_stats, gsum, lsum), _ = jax.lax.scan(
        micro, (batch_stats, zero_g, jnp.zeros((), jnp.float32)), mbs)
    inv = 1.0 / grad_accum
    return (lsum * inv, new_stats), jax.tree.map(lambda g: g * inv, gsum)


@partial(jax.jit, static_argnames=("loss_cfg", "ema_decay", "grad_accum"),
         donate_argnames=("state",))
def train_step(state: TrainState, batch: Dict[str, jax.Array],
               loss_cfg: LossConfig,
               ema_decay: float = 0.0,
               grad_accum: int = 1) -> Tuple[TrainState, jax.Array]:
    """One SPMD optimization step. Returns (new_state, loss)."""
    if grad_accum > 1:
        (loss, new_stats), grads = _accumulated_grads(
            state.params, state.batch_stats, state.apply_fn, batch,
            loss_cfg, grad_accum)
    else:
        (loss, new_stats), grads = jax.value_and_grad(
            _loss_and_updates, has_aux=True)(
            state.params, state.batch_stats, state.apply_fn, batch, loss_cfg)
    # NaN guard: skip the update when the loss is non-finite, keep training.
    ok = jnp.isfinite(loss)
    grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
    updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    guarded = jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                           params, state.params)
    ema = state.ema_params
    if ema_decay > 0 and ema != ():
        d = jnp.float32(ema_decay)
        ema = jax.tree.map(lambda e, p: e * d + p.astype(e.dtype) * (1 - d),
                           ema, guarded)
    new_state = state.replace(
        step=state.step + 1,
        params=guarded,
        batch_stats=jax.tree.map(lambda new, old: jnp.where(ok, new, old),
                                 new_stats, state.batch_stats),
        opt_state=opt_state, ema_params=ema)
    return new_state, loss


@partial(jax.jit, static_argnames=("loss_cfg", "use_ema"))
def eval_step(state: TrainState, batch: Dict[str, jax.Array],
              loss_cfg: LossConfig,
              use_ema: bool = False) -> Dict[str, jax.Array]:
    """Validation: loss + on-device PSNR/SSIM vs the uint8 ground truth.

    With ``use_ema`` the EMA weights are scored — they are what exports for
    inference, so best-checkpoint selection must rank them, not the raw
    params.
    """
    from ..ops.image import denormalize_to_uint8

    f0 = normalize_uint8(batch["f0"])
    f1 = normalize_uint8(batch["f1"])
    gt = normalize_uint8(batch["gt"])
    params = state.ema_params if use_ema else state.params
    pred = state.apply_fn({"params": params,
                           "batch_stats": state.batch_stats},
                          f0, f1, train=False)
    loss = combined_loss(pred, gt, loss_cfg.mse_weight, loss_cfg.ssim_weight,
                         loss_cfg.ssim_window, loss_cfg.ssim_sigma)
    pred_u8 = denormalize_to_uint8(pred)
    return {"loss": loss,
            "psnr": jnp.mean(psnr(pred_u8, batch["gt"])),
            "ssim": jnp.mean(ssim_eval(pred_u8, batch["gt"]))}


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau (reference ``model/train.py:163-165``), host-side."""

    factor: float = 0.5
    patience: int = 10
    best: float = float("inf")
    bad_epochs: int = 0

    def update(self, metric: float, lr: float) -> float:
        if metric < self.best - 1e-12:
            self.best = metric
            self.bad_epochs = 0
            return lr
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            return lr * self.factor
        return lr


@dataclasses.dataclass
class History:
    train_loss: List[float] = dataclasses.field(default_factory=list)
    val_loss: List[float] = dataclasses.field(default_factory=list)
    val_psnr: List[float] = dataclasses.field(default_factory=list)
    val_ssim: List[float] = dataclasses.field(default_factory=list)
    lr: List[float] = dataclasses.field(default_factory=list)


def train_model(model: FrameInterpolationUNet, variables,
                train_loader: Iterable, val_loader: Iterable,
                cfg: TrainConfig, mesh=None,
                checkpointer=None, log_fn: Callable[[str], None] = print,
                start_epoch: int = 0, state: Optional[TrainState] = None,
                history: Optional[History] = None) -> Tuple[TrainState, History]:
    """Epoch-driven host loop around the jitted SPMD steps.

    Keeps the reference's training contract (epochs, val phase, plateau LR,
    best-val checkpoint) while all device work stays inside two compiled
    programs.
    """
    if mesh is None:
        mesh = make_mesh()
    try:
        if len(train_loader) == 0:
            raise ValueError(
                "train loader yields zero batches per epoch (batch size "
                "larger than the train set with drop_remainder): every "
                "epoch would be a no-op with train loss nan")
    except TypeError:
        pass  # plain iterables without __len__: checked lazily below
    if state is None:
        state = create_train_state(model, variables, cfg)
        # replicate the state across the mesh once, up front
        state = jax.device_put(state, replicated(mesh))
    history = history or History()
    sched = PlateauScheduler(cfg.plateau_factor, cfg.plateau_patience)
    for past in history.val_loss:          # resume: replay plateau state
        sched.update(past, get_learning_rate(state))
    best_val = min(history.val_loss, default=float("inf"))
    loss_cfg = cfg.loss

    for epoch in range(start_epoch, cfg.epochs):
        t0 = time.time()
        train_losses = []
        for batch in train_loader:
            state, loss = train_step(state, batch, loss_cfg,
                                     ema_decay=cfg.ema_decay,
                                     grad_accum=cfg.grad_accum)
            train_losses.append(loss)
        train_loss = float(np.mean([float(x) for x in train_losses])) \
            if train_losses else float("nan")

        val_metrics = {"loss": [], "psnr": [], "ssim": []}
        use_ema = cfg.ema_decay > 0 and state.ema_params != ()
        for batch in val_loader:
            m = eval_step(state, batch, loss_cfg, use_ema=use_ema)
            for k in val_metrics:
                val_metrics[k].append(float(m[k]))
        val_loss = float(np.mean(val_metrics["loss"])) if val_metrics["loss"] \
            else float("nan")

        lr = get_learning_rate(state)
        new_lr = sched.update(val_loss, lr)
        if new_lr != lr:
            state = set_learning_rate(state, new_lr)
            log_fn(f"  plateau: lr {lr:.2e} -> {new_lr:.2e}")

        history.train_loss.append(train_loss)
        history.val_loss.append(val_loss)
        history.val_psnr.append(float(np.mean(val_metrics["psnr"]))
                                if val_metrics["psnr"] else float("nan"))
        history.val_ssim.append(float(np.mean(val_metrics["ssim"]))
                                if val_metrics["ssim"] else float("nan"))
        history.lr.append(new_lr)

        log_fn(f"epoch {epoch + 1}/{cfg.epochs}  "
               f"train {train_loss:.6f}  val {val_loss:.6f}  "
               f"psnr {history.val_psnr[-1]:.2f}  "
               f"ssim {history.val_ssim[-1]:.4f}  lr {new_lr:.2e}  "
               f"({time.time() - t0:.1f}s)")

        if checkpointer is not None:
            improved = val_loss < best_val
            if improved:
                best_val = val_loss
            # "latest" (the resume point) costs a full device->host state
            # fetch every epoch — params + optimizer (+ EMA) — which
            # dominates wall time on transfer-limited hosts. save_every
            # thins it; "best" (what exports for inference) always saves.
            last = epoch + 1 == cfg.epochs
            latest = (cfg.save_every <= 1
                      or (epoch + 1) % cfg.save_every == 0 or last)
            if improved or latest:
                checkpointer.save(state=state, epoch=epoch, history=history,
                                  best=improved, latest=latest)
    return state, history
