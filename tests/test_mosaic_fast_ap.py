"""Mosaic augmentation + on-device fast AP proxy tests."""

from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from wildlifemapper_tpu.data.mosaic import box_candidates, make_mosaic
from wildlifemapper_tpu.eval.fast_ap import fast_ap50

REF_ANN = Path("/root/reference/coco_annotations/val.json")


def test_make_mosaic_shapes(rng):
    imgs = [rng.integers(0, 255, (100 + 10 * i, 120, 3), dtype=np.uint8)
            for i in range(4)]
    tgts = [{"boxes": np.asarray([[10.0, 10, 40, 40]], np.float32),
             "labels": np.asarray([i + 1], np.int32)} for i in range(4)]
    out, tgt = make_mosaic(imgs, tgts, out_size=128, rng=rng)
    assert out.shape == (128, 128, 3)
    assert tgt["boxes"].shape[1] == 4
    assert (tgt["boxes"] >= 0).all() and (tgt["boxes"] <= 128).all()
    assert len(tgt["boxes"]) == len(tgt["labels"])


def test_box_candidates_filters_degenerate():
    before = np.asarray([[0, 0, 50, 50], [0, 0, 50, 50.0]])
    after = np.asarray([[0, 0, 40, 40], [0, 0, 1, 40.0]])  # 2nd too thin
    keep = box_candidates(before, after)
    assert keep.tolist() == [True, False]


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_mosaic_loader_path(rng):
    from wildlifemapper_tpu.data.loader import CocoDetectionDataset
    from wildlifemapper_tpu.data.transforms import PreprocessConfig

    pre = PreprocessConfig(resize_size=96, canvas_size=128, max_targets=64,
                           use_mosaic=True, allow_truncation=True)
    ds = CocoDetectionDataset(str(REF_ANN), None, pre, synthetic=True,
                              synthetic_size=256)
    ex = ds.get(0, rng)
    assert ex["image"].shape == (128, 128, 3)
    assert ex["boxes"].shape == (64, 4)


def test_fast_ap50_perfect_and_empty():
    b, q, t = 2, 8, 8
    gt_boxes = np.tile(np.asarray([[10, 10, 20, 20.0]]), (b, t, 1))
    for i in range(t):
        gt_boxes[:, i] += i * 15
    gt_labels = np.ones((b, t), np.int32)
    gt_valid = np.zeros((b, t), bool)
    gt_valid[:, :4] = True

    det_boxes = gt_boxes.copy()
    det_scores = np.linspace(0.9, 0.2, q)[None, :].repeat(b, 0)
    det_labels = np.ones((b, q), np.int32)
    det_keep = gt_valid.copy()  # detections exactly on the 4 valid GTs

    ap = float(fast_ap50(jnp.asarray(det_boxes), jnp.asarray(det_scores),
                         jnp.asarray(det_labels), jnp.asarray(det_keep),
                         jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                         jnp.asarray(gt_valid)))
    assert ap == pytest.approx(1.0, abs=1e-5)

    # no detections kept -> AP 0
    ap0 = float(fast_ap50(jnp.asarray(det_boxes), jnp.asarray(det_scores),
                          jnp.asarray(det_labels),
                          jnp.zeros((b, q), bool),
                          jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                          jnp.asarray(gt_valid)))
    assert ap0 == pytest.approx(0.0, abs=1e-6)


def test_fast_ap50_half():
    """1 TP + 1 FP-first ordering -> AP = 0.5-ish behavior check."""
    b, q, t = 1, 2, 4
    gt_boxes = np.zeros((b, t, 4), np.float32)
    gt_boxes[0, 0] = [0, 0, 10, 10]
    gt_labels = np.ones((b, t), np.int32)
    gt_valid = np.zeros((b, t), bool)
    gt_valid[0, 0] = True
    det_boxes = np.asarray([[[50, 50, 60, 60], [0, 0, 10, 10.0]]], np.float32)
    det_scores = np.asarray([[0.9, 0.8]], np.float32)
    det_labels = np.ones((b, q), np.int32)
    det_keep = np.ones((b, q), bool)
    ap = float(fast_ap50(jnp.asarray(det_boxes), jnp.asarray(det_scores),
                         jnp.asarray(det_labels), jnp.asarray(det_keep),
                         jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
                         jnp.asarray(gt_valid)))
    assert ap == pytest.approx(0.5, abs=0.01)
