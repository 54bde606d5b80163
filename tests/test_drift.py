"""eval/drift.py — detections-vs-detections drift scored as mAP.

The shared methodology behind scripts/drift_map.py (full-scale TPU) and
scripts/drift_proxy_cpu.py (CPU proxy); run_detections is exercised
end-to-end by those scripts and tests/test_content_crop.py-style flows.
"""
import numpy as np

from wildlifemapper_tpu.eval.drift import drift_summary, pseudo_gt_index


def _dets(boxes_per_img, scores_per_img, labels_per_img, q=8):
    n = len(boxes_per_img)
    boxes = np.zeros((n, q, 4), np.float32)
    scores = np.zeros((n, q), np.float32)
    labels = np.ones((n, q), np.int32)
    for i, (b, s, lab) in enumerate(zip(boxes_per_img, scores_per_img,
                                        labels_per_img)):
        boxes[i, :len(b)] = b
        scores[i, :len(s)] = s
        labels[i, :len(lab)] = lab
    return {"boxes": boxes, "scores": scores, "labels": labels}


BOXES = [[[10, 10, 50, 60], [100, 100, 180, 150]],
         [[200, 40, 260, 90]]]


def test_identical_detections_score_ap_1():
    gt = _dets(BOXES, [[0.9, 0.8], [0.7]], [[1, 2], [1]])
    s = drift_summary(gt, gt, n=2)
    assert s["AP"] == 1.0 and s["AP50"] == 1.0


def test_missing_detection_lowers_ap():
    gt = _dets(BOXES, [[0.9, 0.8], [0.7]], [[1, 2], [1]])
    pred = _dets([BOXES[0][:1], BOXES[1]], [[0.9], [0.7]], [[1], [1]])
    s = drift_summary(gt, pred, n=2)
    assert s["AP"] < 1.0


def test_gt_thresh_drops_low_confidence_pseudo_gt():
    # The 0.45-score detection is GT at thresh 0.3 but not at the serving
    # threshold 0.5 — the @serve0.5 rows score only confident detections.
    gt = _dets(BOXES, [[0.9, 0.45], [0.7]], [[1, 1], [1]])
    idx_03 = pseudo_gt_index(gt, 2, gt_thresh=0.3)
    idx_05 = pseudo_gt_index(gt, 2, gt_thresh=0.5)
    assert len(idx_03.annotations(0)) == 2
    assert len(idx_05.annotations(0)) == 1

    # A tier that reproduces only the confident detection: imperfect at
    # 0.3, perfect at the serving threshold.
    pred = _dets([BOXES[0][:1], BOXES[1]], [[0.9], [0.7]], [[1], [1]])
    assert drift_summary(gt, pred, 2, gt_thresh=0.3)["AP"] < 1.0
    assert drift_summary(gt, pred, 2, gt_thresh=0.5)["AP"] == 1.0


def test_run_detections_pads_and_trims_tail_batch():
    """5 tiles through batch 4: the tail batch is padded for fixed shapes
    and the output trimmed back to 5; self-drift over the result is 1.0."""
    import jax

    from tests.test_model import tiny_config
    from wildlifemapper_tpu.eval.drift import run_detections
    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    tiles = np.random.default_rng(0).normal(
        size=(5, 64, 64, 3)).astype(np.float32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), tiles[:1])
    dets = run_detections(cfg, params, tiles, batch=4)
    assert dets["boxes"].shape == (5, 7, 4)
    assert dets["scores"].shape == (5, 7)
    s = drift_summary(dets, dets, n=5, gt_thresh=0.0)
    assert s["AP"] == 1.0


def test_shifted_boxes_degrade_strict_iou_first():
    gt = _dets(BOXES, [[0.9, 0.8], [0.7]], [[1, 2], [1]])
    shifted = [[[b[0] + 3, b[1] + 3, b[2] + 3, b[3] + 3] for b in img]
               for img in BOXES]
    pred = _dets(shifted, [[0.9, 0.8], [0.7]], [[1, 2], [1]])
    s = drift_summary(gt, pred, n=2)
    assert s["AP50"] == 1.0          # small shift clears IoU .5
    assert s["AP"] < s["AP50"]       # but not the strict .5:.95 ladder
