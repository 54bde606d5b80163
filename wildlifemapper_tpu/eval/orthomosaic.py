"""Streaming orthomosaic inference: sliding-window tiling -> fixed-shape
batched detection -> global cross-seam NMS (BASELINE config 4).

The whole device path is one jitted program per tile-batch (preprocess
normalization fused with the model); tile extraction and final fusion are
host-side numpy over small arrays.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data import tiler
from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
from .postprocess import postprocess


def _nms_numpy(boxes: np.ndarray, scores: np.ndarray, iou: float) -> np.ndarray:
    """Greedy class-agnostic NMS over the (small) fused candidate set."""
    order = np.argsort(-scores, kind="mergesort")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx0 = np.maximum(boxes[i, 0], boxes[order, 0])
        yy0 = np.maximum(boxes[i, 1], boxes[order, 1])
        xx1 = np.minimum(boxes[i, 2], boxes[order, 2])
        yy1 = np.minimum(boxes[i, 3], boxes[order, 3])
        inter = np.clip(xx1 - xx0, 0, None) * np.clip(yy1 - yy0, 0, None)
        ious = inter / np.maximum(areas[i] + areas[order] - inter, 1e-9)
        suppressed[order[ious > iou]] = True
    return np.asarray(keep, dtype=np.int64)


class OrthomosaicDetector:
    """Detect over an arbitrarily large RGB mosaic with a trained model.

    With `mesh` set, tile batches are sharded over the mesh's 'data' axis —
    every chip runs the detector on its tile shard and XLA gathers the
    fixed-shape detections; tile_batch is rounded up to a multiple of the
    data-axis size. This is the pod-scale mosaic path: tiles ride the data
    axis, params are replicated (or TP-sharded by shard_params upstream).
    """

    def __init__(self, model, params, model_cfg: ModelConfig,
                 tile_batch: int = 4, overlap: int = 256,
                 confidence_threshold: float = 0.5, nms_iou: float = 0.4,
                 mesh=None):
        self.model = model
        self.cfg = model_cfg
        self.overlap = overlap
        self.confidence_threshold = confidence_threshold
        self.nms_iou = nms_iou
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import mesh as mesh_lib

            ndata = mesh.shape["data"]
            tile_batch = -(-tile_batch // ndata) * ndata
            self._batch_sharding = mesh_lib.batch_sharding(mesh)
            params = jax.device_put(params, mesh_lib.replicated(mesh))
        self.params = params
        self.tile_batch = tile_batch

        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        tile = model_cfg.img_size

        @jax.jit
        def run(params, tiles_u8):
            # fused preprocess: uint8 -> normalized f32, on device
            x = tiles_u8.astype(jnp.float32) / 255.0
            x = (x - mean) / std
            out = model.apply(params, x)
            sizes = jnp.full((tiles_u8.shape[0], 2), tile, jnp.int32)
            return postprocess(out, sizes, confidence_threshold,
                               hw_swap_compat=False)

        self._run = run

    def _put(self, batch: np.ndarray):
        if self.mesh is None:
            return jnp.asarray(batch)
        return jax.device_put(batch, self._batch_sharding)

    def detect(self, mosaic: np.ndarray) -> Dict[str, np.ndarray]:
        """mosaic: (H, W, 3) uint8. Returns fused detections in mosaic
        coordinates: boxes (N, 4) xyxy, scores (N,), labels (N,).

        Double-buffered: jax dispatch is async, so batch i computes on the
        device while the host extracts tiles for batch i+1 and fuses the
        results of batch i-1 (tile IO overlapped with device compute)."""
        h, w = mosaic.shape[:2]
        grid = tiler.make_tile_grid(h, w, self.cfg.img_size, self.overlap)

        all_boxes, all_scores, all_labels = [], [], []

        def drain(idxs, dets_dev):
            dets = jax.device_get(dets_dev)
            for j, ti in enumerate(idxs):
                keep = dets["keep"][j]
                if not keep.any():
                    continue
                boxes = tiler.uncrop_boxes(dets["boxes"][j][keep],
                                           grid.origins[ti])
                all_boxes.append(boxes)
                all_scores.append(dets["scores"][j][keep])
                all_labels.append(dets["labels"][j][keep])

        pending = None
        for idxs in tiler.batched(range(grid.num_tiles), self.tile_batch):
            # per-batch extraction: only tile_batch tiles resident at a time
            batch = tiler.extract_tiles(mosaic, grid, idxs)
            pad = self.tile_batch - len(idxs)
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            dets_dev = self._run(self.params, self._put(batch))  # async
            if pending is not None:
                drain(*pending)
            pending = (idxs, dets_dev)
        if pending is not None:
            drain(*pending)

        if not all_boxes:
            return {"boxes": np.zeros((0, 4)), "scores": np.zeros(0),
                    "labels": np.zeros(0, np.int64)}
        boxes = np.concatenate(all_boxes)
        scores = np.concatenate(all_scores)
        labels = np.concatenate(all_labels)
        keep = _nms_numpy(boxes, scores, self.nms_iou)
        return {"boxes": boxes[keep], "scores": scores[keep],
                "labels": labels[keep]}
