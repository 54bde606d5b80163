"""Jitted train/eval steps with mesh sharding.

The reference's hot loop (train.py:261-312): forward, criterion with a
CPU-side Hungarian match, backward, clip, AdamW step, DDP gradient
all-reduce. Here the whole step — including the matcher — is one XLA
program: batch sharded over the mesh 'data' axis, params replicated (or
TP-sharded over 'model'), gradient all-reduce emitted by XLA because the
loss normalizes over the global batch.

Backward-efficiency note: the reference freezes most of the encoder
(network.py:19-34) but still pays full weight-grad compute. Here frozen
params are split out of the differentiated argument, so XLA skips their
weight-gradient matmuls entirely while still propagating activation grads to
the trainable patch/HFC embeddings below them.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct, traverse_util

from ..config import Config
from ..models import WildlifeMapper
from ..parallel import mesh as mesh_lib
from .criterion import set_criterion
from .optimizer import build_optimizer, param_group


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # Exponential moving average of params (TrainConfig.ema_decay > 0);
    # None when EMA is off. Not a reference feature (TODO queue #7).
    ema_params: Any = None


def _device_normalize(images: jnp.ndarray,
                      sizes: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """uint8 canvases (DataConfig.device_normalize: 4x less host->device
    transfer) -> ImageNet-normalized f32 inside the jitted step; f32 input
    passes through (host already normalized).

    The reference normalizes *before* zero-padding (misc.py:50), so the pad
    band must stay exactly 0.0 in normalized space — `sizes` (B, 2) h/w
    content extents re-zero it (black *content* pixels still normalize to
    -mean/std, as in the reference)."""
    if images.dtype != jnp.uint8:
        return images
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    x = ((images.astype(jnp.float32) / 255.0)
         - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    if sizes is not None:
        h = images.shape[1]
        rows = jnp.arange(h)[None, :, None, None]
        cols = jnp.arange(images.shape[2])[None, None, :, None]
        content = ((rows < sizes[:, 0, None, None, None])
                   & (cols < sizes[:, 1, None, None, None]))
        x = jnp.where(content, x, 0.0)
    return x


def _split_params(params: Dict[str, Any], freeze_encoder: bool):
    flat = traverse_util.flatten_dict(params["params"], sep="/")
    trainable = {k: v for k, v in flat.items()
                 if param_group(k, freeze_encoder) != "frozen"}
    frozen = {k: v for k, v in flat.items()
              if param_group(k, freeze_encoder) == "frozen"}
    return trainable, frozen


def _merge_params(trainable: Dict[str, Any], frozen: Dict[str, Any]):
    flat = dict(frozen)
    flat.update(trainable)
    return {"params": traverse_util.unflatten_dict(flat, sep="/")}


class StepBuilder:
    """Builds jitted, sharded train/eval step functions for a Config."""

    def __init__(self, cfg: Config, mesh=None, use_tp: Optional[bool] = None):
        self.cfg = cfg
        self.model = WildlifeMapper(cfg.model)
        self.mesh = mesh
        self.use_tp = (use_tp if use_tp is not None
                       else cfg.mesh.model_parallel_size > 1)
        self.tx: Optional[optax.GradientTransformation] = None

    # ---- initialization --------------------------------------------------

    def init_params(self, rng_key, batch_size: int = 1):
        x = jnp.zeros((batch_size, self.cfg.model.img_size,
                       self.cfg.model.img_size, 3), jnp.float32)
        return jax.jit(self.model.init)(rng_key, x)

    def init_state(self, params, steps_per_epoch: int) -> TrainState:
        self.tx = build_optimizer(params, self.cfg.train, steps_per_epoch)
        ema = (jax.tree.map(jnp.copy, params)
               if self.cfg.train.ema_decay > 0 else None)
        return TrainState(params=params, opt_state=self.tx.init(params["params"]),
                          step=jnp.zeros((), jnp.int32), ema_params=ema)

    # ---- steps -----------------------------------------------------------

    def train_step_fn(self) -> Callable:
        cfg = self.cfg
        model = self.model
        tx = self.tx
        assert tx is not None, "call init_state first"

        def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                       dropout_rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
            trainable, frozen = _split_params(state.params,
                                              cfg.train.freeze_encoder)

            def loss_fn(trainable_):
                params = _merge_params(trainable_, frozen)
                rng = jax.random.fold_in(dropout_rng, state.step)
                out = model.apply(
                    params,
                    _device_normalize(batch["image"], batch.get("size")),
                    deterministic=False, rngs={"dropout": rng})
                losses = set_criterion(
                    out, {"labels": batch["labels"], "boxes": batch["boxes"],
                          "valid": batch["valid"]},
                    cfg.criterion, num_classes=cfg.model.num_classes)
                return losses["loss"], losses

            (_, losses), grads_t = jax.value_and_grad(
                loss_fn, has_aux=True)(trainable)

            # Rebuild the full-tree gradient with zeros for frozen params so
            # the optimizer pytree matches; those slots are set_to_zero'd.
            grads_flat = {k: jnp.zeros_like(v) for k, v in frozen.items()}
            grads_flat.update(grads_t)
            grads = traverse_util.unflatten_dict(
                {k: v for k, v in grads_flat.items()}, sep="/")

            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params["params"])
            new_params = {"params": optax.apply_updates(
                state.params["params"], updates)}
            metrics = dict(losses)
            metrics["grad_norm"] = optax.global_norm(
                traverse_util.unflatten_dict(grads_t, sep="/"))
            ema = state.ema_params
            if ema is not None and cfg.train.ema_decay > 0:
                d = cfg.train.ema_decay
                ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                                   ema, new_params)
            new_state = TrainState(params=new_params, opt_state=new_opt,
                                   step=state.step + 1, ema_params=ema)
            return new_state, metrics

        return train_step

    def eval_step_fn(self) -> Callable:
        cfg = self.cfg
        model = self.model

        def eval_step(params, batch):
            out = model.apply(params,
                              _device_normalize(batch["image"],
                                                batch.get("size")),
                              deterministic=True)
            losses = set_criterion(
                out, {"labels": batch["labels"], "boxes": batch["boxes"],
                      "valid": batch["valid"]},
                cfg.criterion, num_classes=cfg.model.num_classes,
                # final eval batch is padded by repeating the last example;
                # mask those rows so the losses equal the reference's
                # true-smaller-batch evaluation (inference.py:44-56)
                row_valid=batch.get("batch_valid"))
            return out, losses

        return eval_step

    # ---- sharding --------------------------------------------------------

    def jit_train_step(self):
        """jit with explicit shardings when a mesh is provided."""
        fn = self.train_step_fn()
        if self.mesh is None:
            return jax.jit(fn, donate_argnums=(0,))
        mesh = self.mesh

        def wrapped(state, batch, rng):
            batch = jax.lax.with_sharding_constraint(
                batch, mesh_lib.batch_sharding(mesh))
            return fn(state, batch, rng)

        return jax.jit(wrapped, donate_argnums=(0,))

    def jit_eval_step(self):
        """jit the eval step, batch sharded over the mesh's data axis when a
        mesh is provided — per-epoch val on a single-process multi-chip host
        must use every device, exactly like jit_train_step (the reference
        wraps evaluate's model in the same DDP module it trains,
        inference.py:29-56)."""
        fn = self.eval_step_fn()
        if self.mesh is None:
            return jax.jit(fn)
        mesh = self.mesh

        def wrapped(params, batch):
            batch = jax.lax.with_sharding_constraint(
                batch, mesh_lib.batch_sharding(mesh))
            return fn(params, batch)

        return jax.jit(wrapped)

    def place(self, state: TrainState) -> TrainState:
        """Device_put state with the mesh's param shardings."""
        if self.mesh is None:
            return state
        shard = mesh_lib.shard_params(state.params["params"], self.mesh,
                                      use_tp=self.use_tp)
        params = jax.device_put(state.params["params"], shard)
        rep = mesh_lib.replicated(self.mesh)
        # Optimizer moments follow their params' shardings (TP runs would
        # otherwise replicate 2x param-size state on every chip).
        opt_shard = mesh_lib.shard_opt_state(
            state.opt_state, state.params["params"], self.mesh,
            use_tp=self.use_tp)
        opt_state = jax.device_put(state.opt_state, opt_shard)
        ema = state.ema_params
        if ema is not None:
            ema = {"params": jax.device_put(ema["params"], shard)}
        return TrainState(params={"params": params}, opt_state=opt_state,
                          step=jax.device_put(state.step, rep),
                          ema_params=ema)
