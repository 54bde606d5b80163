"""On-device AP@0.5 proxy for in-loop logging.

The full COCO evaluator (coco_eval.py) is host-side and ragged; this is a
jit-compatible fixed-shape approximation for cheap per-epoch curves: greedy
score-ordered matching at IoU 0.5 per image, batch-pooled 101-point
interpolated precision. Tracks the real AP50 closely but is NOT the COCO
number — use CocoEvaluator for reporting.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import boxes as box_ops


def fast_ap50(det_boxes, det_scores, det_labels, det_keep,
              gt_boxes, gt_labels, gt_valid, iou_thr: float = 0.5):
    """All inputs fixed-shape: det_* (B, Q[, 4]), gt_* (B, T[, 4]) with
    boxes in the same (xyxy) coordinate frame. Returns scalar AP50 proxy."""
    b, q = det_scores.shape
    t = gt_valid.shape[1]

    iou, _ = box_ops.box_iou_pairwise(det_boxes, gt_boxes)  # (B, Q, T)
    cls_ok = det_labels[:, :, None] == gt_labels[:, None, :]
    cand = jnp.where(cls_ok & gt_valid[:, None, :], iou, 0.0)

    order = jnp.argsort(-jnp.where(det_keep, det_scores, -jnp.inf), axis=1)

    def match_one(cand_i, order_i, keep_i):
        def body(j, carry):
            gt_used, tp = carry
            d = order_i[j]
            ious_d = jnp.where(gt_used, 0.0, cand_i[d])
            g = jnp.argmax(ious_d)
            ok = jnp.logical_and(ious_d[g] >= iou_thr, keep_i[d])
            gt_used = gt_used.at[g].set(jnp.logical_or(gt_used[g], ok))
            tp = tp.at[d].set(ok)
            return gt_used, tp

        gt_used0 = jnp.zeros(t, dtype=bool)
        tp0 = jnp.zeros(q, dtype=bool)
        _, tp = jax.lax.fori_loop(0, q, body, (gt_used0, tp0))
        return tp

    tp = jax.vmap(match_one)(cand, order, det_keep)          # (B, Q)

    scores_flat = jnp.where(det_keep, det_scores, -jnp.inf).reshape(-1)
    tp_flat = tp.reshape(-1)
    valid_flat = det_keep.reshape(-1)
    order_flat = jnp.argsort(-scores_flat)
    tp_sorted = tp_flat[order_flat].astype(jnp.float32)
    valid_sorted = valid_flat[order_flat].astype(jnp.float32)

    ctp = jnp.cumsum(tp_sorted)
    cfp = jnp.cumsum(valid_sorted * (1.0 - tp_sorted))
    npos = jnp.maximum(jnp.sum(gt_valid.astype(jnp.float32)), 1.0)
    recall = ctp / npos
    precision = ctp / jnp.maximum(ctp + cfp, 1e-9)

    # monotone precision envelope from the right
    precision = jax.lax.associative_scan(jnp.maximum, precision[::-1])[::-1]
    rec_thrs = jnp.linspace(0.0, 1.0, 101)
    idx = jnp.searchsorted(recall, rec_thrs)
    prec_at = jnp.where(idx < recall.shape[0],
                        precision[jnp.minimum(idx, recall.shape[0] - 1)], 0.0)
    return jnp.mean(prec_at)
