"""The full training loop.

Behavioral parity target: train.py:184-372 — epoch loop with per-iteration
logging, NaN guard, per-epoch evaluation, StepLR (folded into the optax
schedule), periodic + best checkpoints, optional wandb-style logging.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config
from ..data.loader import DataLoader, build_dataset
from ..eval.evaluate import evaluate
from ..parallel import mesh as mesh_lib
from .checkpoints import CheckpointManager
from .metrics import MetricLogger
from .step import StepBuilder, TrainState


def train(cfg: Config, workdir: str = "checkpoints", epochs: Optional[int] = None,
          mesh=None, logger_backend=None, print_fn=print,
          resume: bool = False, init_checkpoint: Optional[str] = None,
          max_steps_per_epoch: Optional[int] = None,
          max_eval_batches: Optional[int] = None) -> Dict[str, float]:
    """Run training; returns final stats. Designed to be importable (CLI is
    a thin wrapper) and testable with tiny configs."""
    epochs = epochs if epochs is not None else cfg.train.epochs

    train_ds = build_dataset("train", cfg.data)
    val_ds = build_dataset("val", cfg.data)
    if cfg.data.max_targets is None:
        # Reflect the annotation-file-resolved cap back into the config so
        # the config.json written beside checkpoints records the run's
        # actual padded target width (criterion.max_targets kept in sync —
        # tests/tools size dummy targets from it).
        import dataclasses
        resolved = train_ds.preprocess.max_targets
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, max_targets=resolved),
            criterion=dataclasses.replace(cfg.criterion,
                                          max_targets=resolved))
    train_loader = DataLoader(
        train_ds, cfg.data.batch_size, shuffle=True, seed=cfg.train.seed,
        drop_last=True, process_index=jax.process_index(),
        process_count=jax.process_count(), num_workers=cfg.data.num_workers,
        worker_mode=cfg.data.worker_mode)
    val_loader = DataLoader(val_ds, cfg.data.batch_size, shuffle=False,
                            drop_last=False,
                            process_index=jax.process_index(),
                            process_count=jax.process_count())

    steps_per_epoch = train_loader.batches_per_epoch()
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)

    builder = StepBuilder(cfg, mesh=mesh)
    rng = jax.random.PRNGKey(cfg.train.seed)
    params = builder.init_params(rng)

    if init_checkpoint:  # torch .pth (SAM or trained WM) starting point
        from ..compat.torch_convert import convert_checkpoint
        params, report = convert_checkpoint(init_checkpoint, params,
                                            depth=cfg.model.vit.depth)
        print_fn(f"loaded {len(report['loaded'])} tensors from "
                 f"{init_checkpoint}; kept init for {len(report['missing'])}")

    state = builder.init_state(params, steps_per_epoch)
    ckpt = CheckpointManager(workdir)
    if jax.process_index() == 0:
        # Persist the exact Config beside the checkpoints so eval-time
        # reconstruction of a from-scratch run (crop_prologue, window 12,
        # scramble fix, ...) never depends on remembering flags.
        from ..config import config_to_json
        (Path(workdir) / "config.json").write_text(config_to_json(cfg))
    start_epoch = 0
    if resume and ckpt.latest_epoch() is not None:
        ep = ckpt.latest_epoch()
        state = ckpt.restore(f"checkpoint_epoch_{ep}", state)
        start_epoch = ep + 1
        print_fn(f"resumed from epoch {ep}")

    if mesh is not None:
        state = builder.place(state)
    train_step = builder.jit_train_step()
    eval_step = builder.jit_eval_step()  # mesh-sharded like the train step
    dropout_rng = jax.random.PRNGKey(cfg.train.seed + 1)

    # The tracked best survives process restarts (segmented runs): it is
    # persisted beside the checkpoints, else a resumed process would start
    # at inf and overwrite best_checkpoint with its first (possibly worse)
    # epoch. best_metric="train_loss" is reference parity
    # (train.py:357-368); "val_ap" keeps the highest val COCO AP instead.
    maximize = cfg.train.best_metric == "val_ap"
    best_value = float("-inf") if maximize else float("inf")
    best_file = Path(workdir) / "best_loss.json"
    if resume and best_file.exists():
        import json
        saved = json.loads(best_file.read_text())
        if saved.get("metric", "train_loss") == cfg.train.best_metric:
            # legacy files carry only {"loss": ...}
            best_value = saved.get("value", saved.get("loss"))
            # exact legacy message for the default metric: log parsers
            # (scripts/val_curve.py) match "resumed best_loss="
            tag = ("best_loss" if cfg.train.best_metric == "train_loss"
                   else f"best_{cfg.train.best_metric}")
            print_fn(f"resumed {tag}={best_value:.4f}")
        else:
            print_fn(f"best metric changed "
                     f"({saved.get('metric', 'train_loss')} -> "
                     f"{cfg.train.best_metric}); best tracker reset")
    stats: Dict[str, float] = {}
    for epoch in range(start_epoch, epochs):
        logger = MetricLogger(print_fn=print_fn)
        t0 = time.time()
        it = iter(train_loader.epoch(epoch))

        def consume(step_j, metrics_dev):
            metrics = {k: float(v)
                       for k, v in jax.device_get(metrics_dev).items()}
            if not np.isfinite(metrics["loss"]):
                # reference: print + sys.exit(1) on non-finite loss
                # (train.py:285-288); with the one-step-delayed fetch the
                # guard trips one step later than the reference's.
                print_fn(f"Loss is {metrics['loss']}, stopping training")
                sys.exit(1)
            logger.update(**metrics)
            if logger_backend and step_j % 50 == 0:
                logger_backend.log_batch(epoch, step_j, metrics)

        # Metrics are fetched one step behind: jax dispatch is async, so
        # step i runs on device while the host stages batch i+1 and reads
        # step i-1's metrics — without this the per-step device_get
        # serializes host IO against device compute.
        pending = None
        for step_i, batch in enumerate(
                logger.log_every(it, 50, header=f"Epoch: [{epoch}]",
                                 total=steps_per_epoch)):
            if step_i >= steps_per_epoch:
                break
            keys = ("image", "labels", "boxes", "valid", "size")
            arrays = {k: batch[k] for k in keys if k in batch}
            state, metrics_dev = train_step(state, arrays, dropout_rng)
            if pending is not None:
                consume(step_i - 1, pending)
            pending = metrics_dev
        if pending is not None:
            consume(steps_per_epoch - 1, pending)

        # host-side meter sync across processes (reference: train.py:315 /
        # misc.py:240-251); train losses are already globally reduced.
        logger.synchronize_between_processes()
        epoch_stats = logger.global_averages()
        epoch_loss = epoch_stats.get("loss", float("inf"))
        print_fn(f"Epoch {epoch} done in {time.time()-t0:.1f}s  "
                 f"loss={epoch_loss:.4f}")

        run_eval = (cfg.train.eval_every <= 1
                    or (epoch + 1) % cfg.train.eval_every == 0
                    or epoch == epochs - 1)
        val_stats = {}
        if run_eval:
            val_stats = evaluate(eval_step, state.params, val_loader,
                                 val_ds.index, cfg, epoch=epoch,
                                 print_fn=print_fn,
                                 max_batches=max_eval_batches,
                                 logger_backend=logger_backend)
        stats = {**{f"train/{k}": v for k, v in epoch_stats.items()},
                 **{f"val/{k}": v for k, v in val_stats.items()}}
        if logger_backend:
            logger_backend.log_epoch(epoch, stats)

        if (logger_backend and cfg.train.log_histograms_every
                and epoch % cfg.train.log_histograms_every == 0):
            # wandb model-watch equivalent (wandb_logger.py:101-120, 272-288)
            logger_backend.log_histograms(epoch, jax.device_get(state.params))

        if maximize:
            candidate = val_stats.get("coco/AP")
            is_best = candidate is not None and candidate > best_value
        else:
            candidate = epoch_loss
            is_best = candidate < best_value
        if is_best:
            best_value = candidate
        if is_best and jax.process_index() == 0:
            import json
            # "loss" key kept for segmented-run readers of older files
            best_file.write_text(json.dumps(
                {"loss": epoch_loss, "epoch": epoch,
                 "metric": cfg.train.best_metric, "value": best_value}))
        # best_every > 1 rate-limits best_checkpoint writes (the fetch+write
        # costs ~25-40 s/epoch over a remote-device tunnel and a converging
        # run improves nearly every epoch); the best epoch since the last
        # allowed save still wins because best_loss tracks every epoch.
        allow_best = ((epoch + 1) % max(cfg.train.best_every, 1) == 0
                      or epoch == epochs - 1)
        ckpt.save_epoch(epoch, lambda: jax.device_get(state),
                        every=cfg.train.checkpoint_every,
                        is_best=is_best and allow_best,
                        force_epoch=epoch == epochs - 1)
        if is_best and logger_backend:
            # best-checkpoint artifact (wandb_logger.py:306-329)
            logger_backend.log_artifact(
                str(ckpt._path("best_checkpoint")), "best_checkpoint",
                type="model", metadata={"epoch": epoch, "loss": epoch_loss,
                                        cfg.train.best_metric: best_value})

    return stats
