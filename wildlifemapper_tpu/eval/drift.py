"""Numerical drift measured as mAP, not tensor distance.

Serving a model in a cheaper configuration (bf16, flash kernels, the
content-crop tier) perturbs its outputs; what matters for parity is not
activation-level distance but whether the *detections* change. This module
scores one configuration's detections against another's: the trusted
tier's post-NMS detections above `gt_thresh` become pseudo ground truth,
and the candidate tier is evaluated against them with the repo's COCOeval
(eval/coco_eval.py) — "drift-as-mAP". AP 1.0 = every detection the
trusted tier keeps is reproduced at matching IoU/score order.

Used by scripts/drift_map.py (full scale, TPU) and
scripts/drift_proxy_cpu.py (1/16-px CPU proxy); methodology identical by
construction since both import this module. Thresholds of record:
pseudo-GT 0.3 (drift harness default) and 0.5 (the serving threshold,
reference visualize_prediction.py:150).
"""
from typing import Dict, Optional

import numpy as np

from .coco_eval import CocoEvaluator

Dets = Dict[str, np.ndarray]  # boxes (N,Q,4) xyxy, scores (N,Q), labels


class DetsIndex:
    """Minimal CocoIndex-alike over pseudo-GT detections."""

    def __init__(self, anns_by_img: dict, cats):
        self._anns = anns_by_img
        self.categories = [{"id": int(c)} for c in cats]

    def annotations(self, img_id):
        return self._anns.get(img_id, [])


def pseudo_gt_index(gt_dets: Dets, n: int, gt_thresh: float = 0.3
                    ) -> DetsIndex:
    """Trusted-tier detections above `gt_thresh` as a COCO-style GT index."""
    anns, cats = {}, set()
    for i in range(n):
        keep = gt_dets["scores"][i] > gt_thresh
        b = gt_dets["boxes"][i][keep]
        labs = gt_dets["labels"][i][keep]
        anns[i] = [{"bbox": [b[j, 0], b[j, 1], b[j, 2] - b[j, 0],
                             b[j, 3] - b[j, 1]],
                    "area": float((b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])),
                    "category_id": int(labs[j]), "iscrowd": 0}
                   for j in range(len(b))]
        cats |= set(int(lab) for lab in labs)
    return DetsIndex(anns, sorted(cats or {1}))


def drift_summary(gt_dets: Dets, pred_dets: Dets, n: int,
                  gt_thresh: float = 0.3, pred_thresh: float = 0.05) -> dict:
    """COCOeval summary of `pred_dets` scored against `gt_dets`-as-GT.

    Returns the full 12-stat summary dict (keys AP, AP50, AP75, ...)."""
    ev = CocoEvaluator(pseudo_gt_index(gt_dets, n, gt_thresh))
    preds = {}
    for i in range(n):
        k = pred_dets["scores"][i] > pred_thresh
        preds[i] = {"boxes": pred_dets["boxes"][i][k],
                    "scores": pred_dets["scores"][i][k],
                    "labels": pred_dets["labels"][i][k]}
    ev.update(preds)
    ev.accumulate()
    return ev.summarize()


def run_detections(cfg, params, tiles: np.ndarray, batch: int,
                   conf: float = 0.05,
                   img_size: Optional[int] = None) -> Dets:
    """Batched jitted forward + postprocess over `tiles` for one model
    config; pads the tail batch (fixed shapes) and trims the output."""
    import jax
    import jax.numpy as jnp

    from ..eval.postprocess import postprocess
    from ..models import WildlifeMapper

    model = WildlifeMapper(cfg)

    @jax.jit
    def fwd(p, x, sz):
        return postprocess(model.apply(p, x), sz, conf)

    n = len(tiles)
    pad = (-n) % batch
    padded = (np.concatenate([tiles, np.repeat(tiles[-1:], pad, axis=0)])
              if pad else tiles)
    sizes = jnp.full((batch, 2), img_size or cfg.img_size, jnp.int32)
    outs = []
    for i in range(0, len(padded), batch):
        outs.append(jax.device_get(
            fwd(params, jnp.asarray(padded[i:i + batch]), sizes)))
    dets = {k: np.concatenate([o[k] for o in outs]) for k in outs[0]}
    return {k: v[:n] for k, v in dets.items()}
