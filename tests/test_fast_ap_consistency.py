"""fast_ap50 (on-device proxy) vs CocoEvaluator AP50 on random scenes —
the proxy must track the real metric closely enough for in-loop curves."""

import numpy as np
import pytest

import jax.numpy as jnp

from tests.test_coco_eval import FakeIndex, _ann, _pred
from wildlifemapper_tpu.eval.coco_eval import CocoEvaluator
from wildlifemapper_tpu.eval.fast_ap import fast_ap50


def _scene(rng, n_gt, n_det, hit_rate):
    """One synthetic image: n_gt boxes, detections hitting `hit_rate` of
    them plus noise."""
    gts = []
    for i in range(n_gt):
        x, y = rng.uniform(0, 400, 2)
        w, h = rng.uniform(20, 60, 2)
        gts.append((x, y, w, h))
    dets, scores = [], []
    for i, (x, y, w, h) in enumerate(gts):
        if rng.random() < hit_rate:
            j = rng.uniform(-2, 2, 2)
            dets.append([x + j[0], y + j[1], x + w + j[0], y + h + j[1]])
            scores.append(rng.uniform(0.6, 1.0))
    for _ in range(n_det - len(dets)):
        x, y = rng.uniform(0, 400, 2)
        dets.append([x, y, x + 30, y + 30])
        scores.append(rng.uniform(0.1, 0.5))
    return gts, np.asarray(dets, np.float64), np.asarray(scores, np.float64)


@pytest.mark.parametrize("hit_rate", [1.0, 0.6, 0.2])
def test_fast_ap_tracks_coco_ap50(hit_rate, rng):
    n_imgs, q, t = 4, 16, 16
    anns_by_img = {}
    det_boxes = np.zeros((n_imgs, q, 4), np.float32)
    det_scores = np.zeros((n_imgs, q), np.float32)
    det_keep = np.zeros((n_imgs, q), bool)
    gt_boxes = np.full((n_imgs, t, 4), 0.0, np.float32)
    gt_valid = np.zeros((n_imgs, t), bool)
    ev = CocoEvaluator(FakeIndex({}, cats=(1,)))

    for img in range(n_imgs):
        gts, dets, scores = _scene(rng, 6, 10, hit_rate)
        anns_by_img[img] = [_ann(x, y, w, h, 1) for x, y, w, h in gts]
        for i, (x, y, w, h) in enumerate(gts):
            gt_boxes[img, i] = [x, y, x + w, y + h]
            gt_valid[img, i] = True
        nd = min(len(dets), q)
        det_boxes[img, :nd] = dets[:nd]
        det_scores[img, :nd] = scores[:nd]
        det_keep[img, :nd] = True
        ev.update({img: _pred(dets, scores, np.ones(len(dets), np.int64))})

    ev.gt = FakeIndex(anns_by_img, cats=(1,))
    ev.accumulate()
    coco_ap50 = ev.summarize()["AP50"]

    labels = np.ones((n_imgs, q), np.int32)
    gt_labels = np.ones((n_imgs, t), np.int32)
    proxy = float(fast_ap50(
        jnp.asarray(det_boxes), jnp.asarray(det_scores), jnp.asarray(labels),
        jnp.asarray(det_keep), jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
        jnp.asarray(gt_valid)))
    assert proxy == pytest.approx(coco_ap50, abs=0.08)
