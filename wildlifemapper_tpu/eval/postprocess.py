"""On-device post-processing: score/label extraction, coordinate scaling,
fixed-shape NMS.

Behavioral parity targets:
  * PostProcess (build_sam.py:212-258): softmax -> per-query max over real
    classes -> confidence filter -> cxcywh->xyxy -> scale to original size.
    The reference swaps h/w when scaling (`img_h, img_w = target_size[1],
    target_size[0]`, build_sam.py:252) — a bug that is a no-op on square
    tiles; `hw_swap_compat` replicates it (default) or fixes it.
  * Visualization path NMS: torchvision.ops.nms(iou=0.4)
    (visualize_prediction.py:150-157) — here a fixed-shape greedy suppression
    over the 51 queries inside jit.

Fixed-shape contract: instead of ragged filtered lists, every function
returns (B, Q) arrays plus a boolean keep mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops


def postprocess(outputs, orig_sizes, confidence_threshold: float = 0.05,
                hw_swap_compat: bool = True):
    """Model outputs -> detections in original-image xyxy coordinates.

    Args:
      outputs: pred_logits (B, Q, L), pred_boxes (B, Q, 4) normalized cxcywh.
      orig_sizes: (B, 2) int [h, w] per image (pre-augmentation size).

    Returns dict(scores (B, Q), labels (B, Q), boxes (B, Q, 4) xyxy abs,
                 keep (B, Q)).
    """
    prob = jax.nn.softmax(outputs["pred_logits"], axis=-1)
    scores = jnp.max(prob[..., :-1], axis=-1)
    labels = jnp.argmax(prob[..., :-1], axis=-1).astype(jnp.int32)

    boxes = box_ops.box_cxcywh_to_xyxy(outputs["pred_boxes"])
    h = orig_sizes[:, 0].astype(boxes.dtype)
    w = orig_sizes[:, 1].astype(boxes.dtype)
    if hw_swap_compat:
        # Reference quirk: scale x by the *height* and y by the *width*.
        scale = jnp.stack([h, w, h, w], axis=-1)
    else:
        scale = jnp.stack([w, h, w, h], axis=-1)
    boxes = boxes * scale[:, None, :]

    keep = scores > confidence_threshold
    return {"scores": scores, "labels": labels, "boxes": boxes, "keep": keep}


def batched_nms(boxes: jnp.ndarray, scores: jnp.ndarray, labels: jnp.ndarray,
                keep: jnp.ndarray, iou_threshold: float = 0.4,
                class_aware: bool = False) -> jnp.ndarray:
    """Greedy NMS over fixed-size candidate sets, vmapped over batch.

    boxes (B, Q, 4) xyxy, scores (B, Q), labels (B, Q), keep (B, Q) initial
    mask. Returns the surviving mask (B, Q). Class-agnostic BY DEFAULT —
    torchvision.ops.nms as called by the reference passes all classes
    together (visualize_prediction.py:154), and CLAUDE.md's convention is
    reference quirks by default; class_aware=True is the opt-in fix.
    """

    def one(b, s, l, k):
        q = s.shape[0]
        iou, _ = box_ops.box_iou_pairwise(b, b)
        same_cls = (l[:, None] == l[None, :]) if class_aware else jnp.bool_(True)
        suppress_pair = jnp.logical_and(iou > iou_threshold, same_cls)

        def body(_, state):
            alive, out = state
            cand = jnp.where(alive, s, -jnp.inf)
            i = jnp.argmax(cand)
            has = cand[i] > -jnp.inf
            out = out.at[i].set(jnp.logical_or(out[i], has))
            kill = jnp.logical_or(suppress_pair[i], jnp.arange(q) == i)
            alive = jnp.where(has, jnp.logical_and(alive, ~kill), alive)
            return alive, out

        alive0 = k
        out0 = jnp.zeros_like(k)
        _, out = jax.lax.fori_loop(0, q, body, (alive0, out0))
        return out

    return jax.vmap(one)(boxes, scores, labels, keep)
