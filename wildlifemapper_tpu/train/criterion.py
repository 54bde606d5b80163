"""DETR-style set criterion with Hungarian matching, fully on-device.

Behavioral parity targets:
  * HungarianMatcher cost = 5*L1 + 1*(-prob[target]) + 2*(-GIoU)
    (matcher.py:54-81, weights from train.py:72-77).
  * SetCriterion CE/L1/GIoU losses + cardinality + class_error
    (build_sam.py:62-210).

Fixed-shape design: targets arrive padded to `max_targets` per image with a
validity mask; the rectangular matching problem is embedded in a square LSAP
(ops/lsap.py) solved inside the jitted step — no host round-trip, no dynamic
shapes. `num_boxes` is the *global* count across the (possibly sharded)
batch; under pjit, jnp.sum over a batch-sharded array already yields the
all-reduced value, matching the reference's dist.all_reduce
(build_sam.py:183-187).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..config import MatchCriterionConfig
from ..ops import boxes as box_ops
from ..ops.lsap import matching_cost_pad, solve_lsap


def hungarian_match(outputs: Dict[str, jnp.ndarray],
                    targets: Dict[str, jnp.ndarray],
                    cfg: MatchCriterionConfig):
    """Compute the optimal query->target assignment.

    Args:
      outputs: pred_logits (B, Q, L), pred_boxes (B, Q, 4) cxcywh in [0,1].
      targets: labels (B, T) int32, boxes (B, T, 4) cxcywh, valid (B, T) bool.

    Returns:
      match_cols: (B, Q) int32 — target slot matched to each query (only
        meaningful where matched).
      matched: (B, Q) bool — query is matched to a *valid* target.
    """
    logits = outputs["pred_logits"]
    pboxes = outputs["pred_boxes"]
    b, q, _ = logits.shape
    t = targets["labels"].shape[1]

    prob = jax.nn.softmax(logits, axis=-1)                      # (B, Q, L)
    cost_class = -jnp.take_along_axis(
        prob, targets["labels"][:, None, :], axis=-1)           # (B, Q, T)
    cost_bbox = jnp.sum(
        jnp.abs(pboxes[:, :, None, :] - targets["boxes"][:, None, :, :]),
        axis=-1)                                                # (B, Q, T)
    cost_giou = -box_ops.generalized_box_iou_pairwise(
        box_ops.box_cxcywh_to_xyxy(pboxes),
        box_ops.box_cxcywh_to_xyxy(targets["boxes"]))           # (B, Q, T)

    cost = (cfg.set_cost_bbox * cost_bbox + cfg.set_cost_class * cost_class
            + cfg.set_cost_giou * cost_giou)
    # Solve with rows = target slots (transposed square): the JV row loop is
    # the matcher's entire cost, and only the valid-target rows need
    # processing (solve_lsap docstring). Real batches have ~10-30 valid
    # targets vs S=128, cutting the serial loop ~10x.
    square = matching_cost_pad(cost, targets["valid"]).transpose(0, 2, 1)
    last_valid = jnp.max(
        jnp.where(targets["valid"], jnp.arange(t)[None, :] + 1, 0))
    t2q = solve_lsap(square, last_valid)                        # (B, S)

    # Invert target->query into the per-query (match_cols, matched) the
    # criterion consumes; rows beyond last_valid / unmatched-to-real-query
    # targets scatter out of bounds and drop.
    tq = t2q[:, :t]                                             # (B, T)
    valid_hit = jnp.logical_and(targets["valid"], tq < q)
    idx = jnp.where(valid_hit, tq, q)
    bidx = jnp.arange(b)[:, None]
    tidx = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[None, :], (b, t))
    match_cols = jnp.zeros((b, q), jnp.int32).at[bidx, idx].set(
        tidx, mode="drop")
    matched = jnp.zeros((b, q), bool).at[bidx, idx].set(
        True, mode="drop")
    return match_cols, matched


def set_criterion(outputs: Dict[str, jnp.ndarray],
                  targets: Dict[str, jnp.ndarray],
                  cfg: MatchCriterionConfig,
                  num_classes: int = 7,
                  row_valid: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
    """Compute all losses. Returns a dict with loss_ce/loss_bbox/loss_giou
    (weighted into 'loss') plus logging metrics (class_error,
    cardinality_error, num_boxes).

    row_valid: optional (B,) bool — batch rows that are real examples. The
    eval loader pads the final batch by repeating the last example
    (data/loader.py) to keep jit shapes fixed; the reference instead
    evaluates the true smaller batch (inference.py:44-56). Masking padded
    rows out of every loss sum/normalizer here makes the fixed-shape losses
    exactly equal to evaluating the unpadded batch. None (training,
    drop_last=True) means all rows are real."""
    logits = outputs["pred_logits"]                             # (B, Q, L)
    pboxes = outputs["pred_boxes"]
    b, q, num_logits = logits.shape

    if row_valid is not None:
        # Dead rows: no valid targets -> no matches, no box losses, and no
        # contribution to num_boxes; CE / cardinality masked explicitly below.
        targets = dict(targets)
        targets["valid"] = jnp.logical_and(targets["valid"],
                                           row_valid[:, None])

    match_cols, matched = hungarian_match(
        jax.lax.stop_gradient(outputs), targets, cfg)

    # Global box count for normalization (clamped to >= 1, build_sam.py:187).
    num_boxes = jnp.maximum(jnp.sum(targets["valid"].astype(jnp.float32)), 1.0)

    # --- classification loss (weighted CE, build_sam.py:93-107) -----------
    # The no-object class is the LAST logit (reference sizes the head
    # num_classes+1, build_sam.py:273). Target index and eos weighting must
    # agree on it — a head sized independently of num_classes would
    # otherwise train a real-class logit as "background" silently.
    assert num_classes == num_logits - 1, (
        f"pred_logits has {num_logits} classes but criterion got "
        f"num_classes={num_classes}; the no-object slot must be the last "
        "logit (num_logits == num_classes + 1)")
    tgt_labels = jnp.take_along_axis(targets["labels"], match_cols, axis=1)
    target_classes = jnp.where(matched, tgt_labels, num_classes)  # (B, Q)
    log_prob = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        log_prob, target_classes[..., None], axis=-1)[..., 0]     # (B, Q)
    # empty_weight: 1 for real classes, eos_coef for the no-object slot;
    # torch's weighted CE normalizes by the sum of selected weights.
    w = jnp.where(target_classes == num_classes, cfg.eos_coef, 1.0)
    if row_valid is not None:
        w = w * row_valid[:, None]  # padded rows: 0 numerator AND denominator
    loss_ce = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-9)

    # class_error: 100 - top1 acc of matched predictions over real classes.
    # The reference slices off the no-object logit before the argmax:
    # build_sam.py:111 is `accuracy(src_logits[idx][..., :-1],
    # target_classes_o)` — so `[..., :-1]` here is exact parity (pinned by
    # tests/test_criterion.py against a transcription of that line).
    pred_cls = jnp.argmax(logits[..., :-1], axis=-1)
    correct = jnp.logical_and(pred_cls == tgt_labels, matched)
    n_matched = jnp.maximum(jnp.sum(matched.astype(jnp.float32)), 1e-9)
    class_error = 100.0 * (1.0 - jnp.sum(correct.astype(jnp.float32)) / n_matched)

    # --- box losses (build_sam.py:128-147) --------------------------------
    tgt_boxes = jnp.take_along_axis(
        targets["boxes"], match_cols[..., None], axis=1)          # (B, Q, 4)
    l1 = jnp.sum(jnp.abs(pboxes - tgt_boxes), axis=-1)            # (B, Q)
    loss_bbox = jnp.sum(jnp.where(matched, l1, 0.0)) / num_boxes

    giou = box_ops.generalized_box_iou_aligned(
        box_ops.box_cxcywh_to_xyxy(pboxes),
        box_ops.box_cxcywh_to_xyxy(tgt_boxes))                    # (B, Q)
    loss_giou = jnp.sum(jnp.where(matched, 1.0 - giou, 0.0)) / num_boxes

    # --- cardinality (logging only, build_sam.py:114-126) -----------------
    card_pred = jnp.sum(
        (jnp.argmax(logits, axis=-1) != num_logits - 1).astype(jnp.float32),
        axis=1)
    tgt_lengths = jnp.sum(targets["valid"].astype(jnp.float32), axis=1)
    card_abs = jnp.abs(card_pred - tgt_lengths)
    if row_valid is None:
        cardinality_error = jnp.mean(card_abs)
    else:
        rv = row_valid.astype(jnp.float32)
        cardinality_error = jnp.sum(card_abs * rv) / jnp.maximum(
            jnp.sum(rv), 1.0)

    loss = (cfg.ce_loss_coef * loss_ce + cfg.bbox_loss_coef * loss_bbox
            + cfg.giou_loss_coef * loss_giou)
    out = {
        "loss": loss,
        "loss_ce": loss_ce,
        "loss_bbox": loss_bbox,
        "loss_giou": loss_giou,
        "class_error": class_error,
        "cardinality_error": cardinality_error,
        "num_boxes": num_boxes,
    }
    # Deep supervision: replicate matching + losses per intermediate layer
    # (build_sam.py:195-208; inactive in the reference, functional here).
    for i, aux in enumerate(outputs.get("aux_outputs", [])):
        aux_losses = set_criterion(aux, targets, cfg, num_classes,
                                   row_valid=row_valid)
        out[f"loss_ce_{i}"] = aux_losses["loss_ce"]
        out[f"loss_bbox_{i}"] = aux_losses["loss_bbox"]
        out[f"loss_giou_{i}"] = aux_losses["loss_giou"]
        out["loss"] = out["loss"] + aux_losses["loss"]
    return out
