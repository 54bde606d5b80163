"""Experiment logging with a wandb-compatible adapter.

Behavioral parity target: wandb_logger.py — per-batch loss/lr/class_error
every 50 iters (train.py:305-312), per-epoch train/val stats
(wandb_logger.py:68-99), config capture (:338-402), no-op when disabled
(:39-42). wandb itself is optional (not in this image): when importable it
is used directly; otherwise an offline JSONL backend writes the same
payloads to disk so runs stay inspectable.
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Dict, Optional


class NoOpLogger:
    """Disabled logging (reference: use_wandb=False path)."""

    def log_batch(self, epoch: int, step: int, metrics: Dict[str, float]):
        pass

    def log_epoch(self, epoch: int, stats: Dict[str, float]):
        pass

    def log_images(self, epoch: int, images, detections=None):
        """Bbox-overlay image logging (wandb_logger.py:169-270 equivalent)."""
        pass

    def log_summary(self, stats: Dict[str, float]):
        pass

    def finish(self):
        pass


def render_detections(image_norm, boxes, labels, scores):
    """Denormalize an (H, W, 3) pipeline image and draw detections; shared
    by the image-logging backends and the visualize CLI."""
    import numpy as np
    from PIL import Image

    from ..cli.visualize import draw_detections
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    arr = ((np.asarray(image_norm) * IMAGENET_STD + IMAGENET_MEAN)
           * 255).clip(0, 255).astype("uint8")
    return draw_detections(Image.fromarray(arr), boxes, labels, scores)


class JsonlLogger(NoOpLogger):
    """Offline backend: one JSON object per logged event."""

    def __init__(self, directory: str, config: Optional[Any] = None,
                 run_name: Optional[str] = None):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        name = run_name or time.strftime("run_%Y%m%d_%H%M%S")
        self.path = self.dir / f"{name}.jsonl"
        self._f = open(self.path, "a")
        if config is not None:
            self._write({"event": "config", "config": _config_dict(config)})

    def _write(self, obj):
        obj["time"] = time.time()
        self._f.write(json.dumps(obj) + "\n")
        self._f.flush()

    def log_batch(self, epoch, step, metrics):
        self._write({"event": "batch", "epoch": epoch, "step": step,
                     **{k: float(v) for k, v in metrics.items()}})

    def log_epoch(self, epoch, stats):
        self._write({"event": "epoch", "epoch": epoch,
                     **{k: float(v) for k, v in stats.items()}})

    def log_images(self, epoch, images, detections=None):
        """Render overlays to <run>/images/epoch_<n>_<i>.jpg."""
        img_dir = self.path.parent / f"{self.path.stem}_images"
        img_dir.mkdir(exist_ok=True)
        detections = detections or [None] * len(images)
        for i, (img, det) in enumerate(zip(images, detections)):
            if det is not None:
                rendered = render_detections(img, det["boxes"],
                                             det["labels"], det["scores"])
            else:
                rendered = render_detections(img, [], [], [])
            rendered.save(img_dir / f"epoch_{epoch}_{i}.jpg")
        self._write({"event": "images", "epoch": epoch, "count": len(images)})

    def log_summary(self, stats):
        self._write({"event": "summary",
                     **{k: float(v) for k, v in stats.items()}})

    def finish(self):
        self._f.close()


class WandbLogger(NoOpLogger):
    """Real wandb backend (requires the wandb package)."""

    def __init__(self, project: str, config: Optional[Any] = None,
                 run_name: Optional[str] = None, **kwargs):
        import wandb  # optional dependency

        self._run = wandb.init(project=project, name=run_name,
                               config=_config_dict(config) if config else None,
                               **kwargs)
        self._wandb = wandb

    def log_batch(self, epoch, step, metrics):
        self._wandb.log({"epoch": epoch, "batch": step,
                         **{f"batch/{k}": v for k, v in metrics.items()}})

    def log_epoch(self, epoch, stats):
        self._wandb.log({"epoch": epoch, **stats})

    def log_summary(self, stats):
        for k, v in stats.items():
            self._run.summary[k] = v

    def finish(self):
        self._run.finish()


def _config_dict(config: Any) -> Dict[str, Any]:
    if dataclasses.is_dataclass(config):
        return dataclasses.asdict(config)
    return dict(config)


def setup_logger(use_wandb: bool, workdir: str, config: Optional[Any] = None,
                 project: str = "wildlifemapper-tpu",
                 run_name: Optional[str] = None):
    """Mirror of setup_wandb_logger (wandb_logger.py:338-402): returns a
    no-op unless logging is requested; falls back to JSONL when wandb is
    missing."""
    if not use_wandb:
        return NoOpLogger()
    try:
        return WandbLogger(project, config=config, run_name=run_name)
    except ImportError:
        return JsonlLogger(f"{workdir}/logs", config=config, run_name=run_name)
