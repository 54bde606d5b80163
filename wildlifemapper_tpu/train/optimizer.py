"""Optimizer assembly: AdamW param groups, StepLR schedule, freeze policy.

Behavioral parity targets:
  * Two AdamW param groups at lr 1e-4 / wd 1e-3 (train.py:215-222): group 1 =
    decoder (+ prompt encoder), group 2 = hfc_embed/patch_embed/hfc_attn.
  * StepLR(step_size=40 epochs, gamma=0.1) (train.py:222).
  * Freeze policy (network.py:19-34): inside the image encoder only
    hfc_embed / hfc_attn / patch_embed train; the dense-PE gaussian matrix
    is a torch buffer (never trained).
  * Gradient clipping by global norm 0.1 (train.py:293).
"""

from __future__ import annotations

from typing import Any, Dict

import optax
from flax import traverse_util

from ..config import TrainConfig


def param_group(path: str, freeze_encoder: bool = True) -> str:
    """'main' | 'hfc' | 'frozen' for a flat 'a/b/c' param path."""
    if path.startswith("pos_encoder/"):
        return "frozen"  # buffer in the reference
    if path.startswith("image_encoder/"):
        sub = path.split("/", 1)[1]
        if sub.startswith(("hfc_embed/", "hfc_attn/", "patch_embed/")):
            return "hfc"
        return "frozen" if freeze_encoder else "main"
    return "main"  # box decoder + anything else


def group_labels(params: Dict[str, Any], freeze_encoder: bool = True):
    flat = traverse_util.flatten_dict(params, sep="/")
    labels = {k: param_group(k, freeze_encoder) for k in flat}
    return traverse_util.unflatten_dict(labels, sep="/")


def step_lr(base_lr: float, steps_per_epoch: int, lr_drop_epochs: int,
            factor: float, warmup_steps: int = 0) -> optax.Schedule:
    """StepLR: lr * factor^(epoch // lr_drop_epochs), with optional linear
    warmup from 0 (not in the reference — useful when training from
    scratch instead of the surgically-loaded SAM checkpoint)."""
    decay = optax.exponential_decay(
        init_value=base_lr, transition_steps=lr_drop_epochs * steps_per_epoch,
        decay_rate=factor, staircase=True)
    if warmup_steps <= 0:
        return decay
    warmup = optax.linear_schedule(0.0, base_lr, warmup_steps)
    return optax.join_schedules([warmup, decay], [warmup_steps])


def build_optimizer(params: Dict[str, Any], cfg: TrainConfig,
                    steps_per_epoch: int) -> optax.GradientTransformation:
    warmup = getattr(cfg, "warmup_steps", 0)
    sched_main = step_lr(cfg.lr, steps_per_epoch, cfg.lr_drop,
                         cfg.lr_drop_factor, warmup)
    sched_hfc = step_lr(cfg.hfc_lr, steps_per_epoch, cfg.lr_drop,
                        cfg.lr_drop_factor, warmup)

    def adamw(sched):
        return optax.adamw(learning_rate=sched, weight_decay=cfg.weight_decay)

    labels = group_labels(params["params"] if "params" in params else params,
                          cfg.freeze_encoder)
    # Zero frozen-param grads *before* the global-norm clip: torch only clips
    # trainable params (frozen ones have requires_grad=False), while jax.grad
    # produces real gradients for them.
    import jax

    frozen_mask = jax.tree.map(lambda g: g == "frozen", labels)
    tx = optax.multi_transform(
        {"main": adamw(sched_main), "hfc": adamw(sched_hfc),
         "frozen": optax.set_to_zero()}, labels)
    return optax.chain(optax.masked(optax.set_to_zero(), frozen_mask),
                       optax.clip_by_global_norm(cfg.clip_max_norm), tx)
