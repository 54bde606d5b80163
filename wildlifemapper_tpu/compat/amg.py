"""Automatic-mask-generation utility surface (SAM compat layer).

Behavioral parity target: segment_anything/utils/amg.py — the vestigial SAM
AMG toolkit the reference keeps in-tree (point grids :60-75, uncompressed
RLE encode/decode :80-125, stability score :130-145, crop-box generation
:200-234, uncrop helpers :170-198). None of it is on the reference's
train/eval path, but it describes the tiled/cropped-inference capabilities
a SAM-lineage user expects; the first-class streaming path lives in
data/tiler.py + eval/orthomosaic.py, and this module provides the
API-compatible pieces. Point grids, RLE codecs, and stability score are
re-derived implementations; generate_crop_boxes reproduces the reference's
exact crop-tiling rule (amg.py:200-234) in vectorized form — output-level
parity is intentional there, since downstream tooling indexes into the
box/layer lists positionally.

TPU notes: stability_score and batched_mask_to_box are jnp and jit-safe
(fixed shapes, no data-dependent control flow); RLE codecs are host-side
numpy (they exist to interoperate with COCO tooling, not to run on-device).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np


# ---- point grids (amg.py:60-75 semantics) --------------------------------

def build_point_grid(n_per_side: int) -> np.ndarray:
    """(n^2, 2) xy points evenly covering [0,1]^2, half-cell inset."""
    offset = 1.0 / (2 * n_per_side)
    coords = np.linspace(offset, 1.0 - offset, n_per_side)
    xs, ys = np.meshgrid(coords, coords)
    return np.stack([xs.ravel(), ys.ravel()], axis=-1)


def build_all_layer_point_grids(n_per_side: int, n_layers: int,
                                scale_per_layer: int) -> List[np.ndarray]:
    """One grid per crop layer, scaled down by scale_per_layer each level."""
    return [build_point_grid(max(1, int(n_per_side / (scale_per_layer ** i))))
            for i in range(n_layers + 1)]


# ---- uncompressed RLE (pycocotools-compatible layout) ---------------------

def mask_to_rle(mask: np.ndarray) -> Dict:
    """(H, W) bool -> {'size': [H, W], 'counts': [...]} uncompressed RLE.

    Counts are run lengths in Fortran (column-major) order, always starting
    with the number of leading zeros (possibly 0) — the layout pycocotools
    and SAM's amg both use.
    """
    h, w = mask.shape
    flat = np.asarray(mask, dtype=np.uint8).flatten(order="F")
    # run boundaries
    change = np.nonzero(flat[1:] != flat[:-1])[0] + 1
    idx = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(idx).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    elif flat.size == 0:
        counts = [0]
    return {"size": [h, w], "counts": counts}


def rle_to_mask(rle: Dict) -> np.ndarray:
    """Inverse of mask_to_rle -> (H, W) bool."""
    h, w = rle["size"]
    flat = np.zeros(h * w, dtype=bool)
    pos = 0
    val = False
    for count in rle["counts"]:
        flat[pos:pos + count] = val
        pos += count
        val = not val
    return flat.reshape((w, h)).T  # undo Fortran order


def area_from_rle(rle: Dict) -> int:
    return int(sum(rle["counts"][1::2]))


# ---- mask quality / geometry (jnp, jit-safe) ------------------------------

def calculate_stability_score(mask_logits: jnp.ndarray,
                              mask_threshold: float,
                              threshold_offset: float) -> jnp.ndarray:
    """(..., H, W) logits -> (...) IoU between the masks thresholded at
    (t + offset) and (t - offset); 1.0 when both are empty."""
    hi = jnp.sum(mask_logits > (mask_threshold + threshold_offset),
                 axis=(-1, -2)).astype(jnp.float32)
    lo = jnp.sum(mask_logits > (mask_threshold - threshold_offset),
                 axis=(-1, -2)).astype(jnp.float32)
    return jnp.where(lo > 0, hi / jnp.maximum(lo, 1.0), 1.0)


def batched_mask_to_box(masks: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W) bool -> (..., 4) xyxy; zeros for empty masks
    (delegates to ops.boxes.masks_to_boxes, batched over leading dims)."""
    from ..ops.boxes import masks_to_boxes

    lead = masks.shape[:-2]
    flat = masks.reshape((-1,) + masks.shape[-2:])
    return masks_to_boxes(flat).reshape(lead + (4,))


# ---- crop boxes (amg.py:200-234 semantics) --------------------------------

def generate_crop_boxes(im_size: Tuple[int, int], n_layers: int,
                        overlap_ratio: float
                        ) -> Tuple[List[List[int]], List[int]]:
    """Per-layer crop boxes: layer i has (2**i)^2 overlapping crops plus the
    layer-0 full image. Returns (boxes xyxy, layer indices).

    Output parity with the reference's generate_crop_boxes
    (segment_anything/utils/amg.py:200-234) — same tiling rule, vectorized:
    layer i uses n = 2^i crops per side whose overlap is
    `int(overlap_ratio * short_side * 2 / n)` pixels, and the crop length is
    the smallest integer L with n*L - (n-1)*overlap >= extent (so the grid
    covers the image); origins step by the stride L - overlap and boxes are
    clamped to the image. Box order (x-major, matching the reference's
    itertools.product) is preserved so layer_idxs line up downstream."""
    im_h, im_w = im_size
    short_side = min(im_h, im_w)
    crop_boxes: List[List[int]] = [[0, 0, im_w, im_h]]
    layer_idxs: List[int] = [0]

    for layer in range(1, n_layers + 1):
        n = 2 ** layer
        overlap = int(overlap_ratio * short_side * (2.0 / n))
        cw = int(np.ceil((im_w + (n - 1) * overlap) / n))
        ch = int(np.ceil((im_h + (n - 1) * overlap) / n))
        gx, gy = np.meshgrid(np.arange(n) * (cw - overlap),
                             np.arange(n) * (ch - overlap), indexing="ij")
        x0, y0 = gx.ravel(), gy.ravel()
        grid = np.stack([x0, y0, np.minimum(x0 + cw, im_w),
                         np.minimum(y0 + ch, im_h)], axis=1)
        crop_boxes.extend(grid.astype(int).tolist())
        layer_idxs.extend([layer] * (n * n))
    return crop_boxes, layer_idxs


def uncrop_boxes_xyxy(boxes: jnp.ndarray, crop_box: List[int]) -> jnp.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return boxes + jnp.asarray([[x0, y0, x0, y0]], dtype=boxes.dtype)


def uncrop_points(points: jnp.ndarray, crop_box: List[int]) -> jnp.ndarray:
    x0, y0 = crop_box[0], crop_box[1]
    return points + jnp.asarray([[x0, y0]], dtype=points.dtype)
