"""Box utilities in jnp (reference: segment_anything/utils/box_ops.py).

All functions are shape-polymorphic over leading dims and jit-safe. Unlike the
reference (which asserts on degenerate boxes, box_ops.py:51-52), these are
total functions: degenerate boxes produce well-defined (clamped) values so the
ops can run inside jit on padded fixed-shape batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def box_xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou_pairwise(a: jnp.ndarray, b: jnp.ndarray):
    """IoU between all pairs. a: (..., N, 4), b: (..., M, 4) xyxy.

    Returns (iou, union), each (..., N, M).
    """
    area_a = box_area(a)  # (..., N)
    area_b = box_area(b)  # (..., M)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    iou = inter / jnp.maximum(union, 1e-9)
    return iou, union


def generalized_box_iou_pairwise(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU (https://giou.stanford.edu/), xyxy inputs.

    Matches box_ops.generalized_box_iou (box_ops.py:40-61) on valid boxes.
    """
    iou, union = box_iou_pairwise(a, b)
    lt = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)


def box_iou_aligned(a: jnp.ndarray, b: jnp.ndarray):
    """Elementwise IoU of aligned box arrays (..., 4)."""
    area_a = box_area(a)
    area_b = box_area(b)
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9), union


def masks_to_boxes(masks: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W) binary masks -> (N, 4) xyxy bounding boxes; zeros for empty
    masks (reference box_ops.py:64-87). jit-safe via masked min/max."""
    n, h, w = masks.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    m = masks.astype(bool)
    big = jnp.float32(1e9)
    x_min = jnp.min(jnp.where(m, xs, big), axis=(1, 2))
    y_min = jnp.min(jnp.where(m, ys, big), axis=(1, 2))
    x_max = jnp.max(jnp.where(m, xs, -big), axis=(1, 2))
    y_max = jnp.max(jnp.where(m, ys, -big), axis=(1, 2))
    any_ = m.any(axis=(1, 2))
    boxes = jnp.stack([x_min, y_min, x_max, y_max], axis=-1)
    return jnp.where(any_[:, None], boxes, 0.0)


def generalized_box_iou_aligned(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GIoU of aligned box arrays — the diag of the pairwise
    version, computed in O(N) (the reference materializes the full N×N matrix
    then takes the diagonal, build_sam.py:143-145)."""
    iou, union = box_iou_aligned(a, b)
    lt = jnp.minimum(a[..., :2], b[..., :2])
    rb = jnp.maximum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    hull = wh[..., 0] * wh[..., 1]
    return iou - (hull - union) / jnp.maximum(hull, 1e-9)
