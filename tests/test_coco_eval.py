"""COCO mAP implementation tests on hand-computable cases."""

import numpy as np
import pytest

from wildlifemapper_tpu.eval.coco_eval import CocoEvaluator, iou_xyxy


class FakeIndex:
    def __init__(self, anns_by_img, cats=(1, 2)):
        self._anns = anns_by_img
        self.categories = [{"id": c} for c in cats]

    def annotations(self, img_id):
        return self._anns.get(img_id, [])


def _ann(x, y, w, h, cat, crowd=0):
    return {"bbox": [x, y, w, h], "area": w * h, "category_id": cat,
            "iscrowd": crowd}


def _pred(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, dtype=np.float64),
            "scores": np.asarray(scores, dtype=np.float64),
            "labels": np.asarray(labels, dtype=np.int64)}


def test_iou():
    d = np.asarray([[0, 0, 10, 10.0]])
    g = np.asarray([[0, 0, 10, 10.0], [5, 5, 15, 15.0]])
    iou = iou_xyxy(d, g, np.asarray([False, False]))
    np.testing.assert_allclose(iou[0, 0], 1.0)
    np.testing.assert_allclose(iou[0, 1], 25 / 175)
    # crowd semantics: inter / dt area
    iou_c = iou_xyxy(d, g, np.asarray([False, True]))
    np.testing.assert_allclose(iou_c[0, 1], 25 / 100)


def test_perfect_detection_is_ap1():
    gt = FakeIndex({1: [_ann(10, 10, 50, 40, 1)], 2: [_ann(5, 5, 30, 30, 2)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[10, 10, 60, 50]], [0.9], [1]),
               2: _pred([[5, 5, 35, 35]], [0.8], [2])})
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AR100"] == pytest.approx(1.0)


def test_no_detections_is_ap0():
    gt = FakeIndex({1: [_ann(10, 10, 50, 40, 1)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred(np.zeros((0, 4)), [], [])})
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(0.0)


def test_half_recall():
    """Two GTs, one detected perfectly, one missed: AP = 0.5 (precision 1 up
    to recall 0.5, then 0)."""
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1), _ann(50, 50, 10, 10, 1)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[0, 0, 10, 10]], [0.9], [1])})
    ev.accumulate()
    stats = ev.summarize()
    # 101-pt interpolation: precision 1.0 at recall thresholds 0..0.5
    # (51 of 101 points) -> AP = 51/101
    assert stats["AP"] == pytest.approx(51 / 101, abs=1e-6)


def test_false_positive_after_tp():
    """One GT, a matching det (score .9) and a spurious det (score .8):
    P@recall .5 region is 1.0; AP stays 51/101, AP50 likewise."""
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[0, 0, 10, 10], [80, 80, 90, 90]], [0.9, 0.8], [1, 1])})
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)  # FP comes after full recall
    # reversed scores: FP first -> precision at recall>0 is 1/2
    ev2 = CocoEvaluator(gt)
    ev2.update({1: _pred([[0, 0, 10, 10], [80, 80, 90, 90]],
                         [0.8, 0.9], [1, 1])})
    ev2.accumulate()
    assert ev2.summarize()["AP"] == pytest.approx(0.5)


def test_localization_quality_thresholds():
    """IoU = 0.6 detection counts at thresholds .5/.55/.6 only -> AP = 3/10."""
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1)]})
    ev = CocoEvaluator(gt)
    # det [0,0,6,10] vs gt [0,0,10,10]: inter 60, union 100 -> iou 0.6
    ev.update({1: _pred([[0, 0, 6, 10]], [0.9], [1])})
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP50"] == pytest.approx(1.0)
    assert stats["AP75"] == pytest.approx(0.0)
    assert stats["AP"] == pytest.approx(0.3)


def test_area_ranges():
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1),      # small (100 px)
                        _ann(100, 100, 50, 50, 1)]})  # medium (2500 px)
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[0, 0, 10, 10], [100, 100, 150, 150]],
                        [0.9, 0.8], [1, 1])})
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP_small"] == pytest.approx(1.0)
    assert stats["AP_medium"] == pytest.approx(1.0)
    assert stats["AP_large"] == -1.0  # no large GT -> undefined


def test_crowd_gt_is_ignored():
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1, crowd=1)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[0, 0, 10, 10]], [0.9], [1])})
    ev.accumulate()
    stats = ev.summarize()
    # only crowd GT: no countable positives -> category undefined
    assert stats["AP"] == -1.0


def test_crowd_iou_uses_det_area_and_ignores_match():
    """pycocotools semantics: IoU against a crowd GT is inter/area(det)
    (not inter/union), and a det matched to crowd is IGNORED, never a
    false positive. Here the spurious det covers only a corner of the big
    crowd region: standard IoU would be 100/10000 = 0.01 (no match -> FP
    -> AP 0.835), crowd IoU is 100/100 = 1.0 (match -> ignored -> AP 1)."""
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1),
                        _ann(100, 100, 100, 100, 1, crowd=1)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[0, 0, 10, 10], [100, 100, 110, 110]],
                        [0.9, 0.8], [1, 1])})
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP"] == pytest.approx(1.0)


def test_unmatched_det_outside_area_range_is_ignored():
    """pycocotools ignores (does not count as FP) an unmatched detection
    whose area falls outside the evaluated range. The 9x9=81 px spurious
    det is outside 'medium' [32^2, 96^2), so AP_medium stays 1.0; in the
    'all' range it is a genuine FP after full recall (AP still 1.0), and
    with reversed scores it halves AP_all but not AP_medium."""
    gt = FakeIndex({1: [_ann(100, 100, 50, 50, 1)]})       # medium GT
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[100, 100, 150, 150], [0, 0, 9, 9]],
                        [0.8, 0.9], [1, 1])})              # FP scored higher
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AP_medium"] == pytest.approx(1.0)
    assert stats["AP"] == pytest.approx(0.5)


def test_second_det_on_same_gt_is_fp():
    """A GT matches at most one det (highest score wins); the duplicate is
    an FP after full recall, so AP stays 1.0 but AP would drop if it
    outscored the true det's recall point — pinned via reversed order."""
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[0, 0, 10, 10], [0, 0, 10, 10]],
                        [0.9, 0.8], [1, 1])})
    ev.accumulate()
    assert ev.summarize()["AP"] == pytest.approx(1.0)


def test_maxdets_1_vs_10():
    anns = [_ann(i * 20, 0, 10, 10, 1) for i in range(5)]
    gt = FakeIndex({1: anns})
    preds = _pred([[i * 20, 0, i * 20 + 10, 10] for i in range(5)],
                  [0.9 - 0.01 * i for i in range(5)], [1] * 5)
    ev = CocoEvaluator(gt)
    ev.update({1: preds})
    ev.accumulate()
    stats = ev.summarize()
    assert stats["AR1"] == pytest.approx(0.2)
    assert stats["AR10"] == pytest.approx(1.0)


def test_per_category_ap():
    gt = FakeIndex({1: [_ann(0, 0, 10, 10, 1), _ann(50, 50, 10, 10, 2)]})
    ev = CocoEvaluator(gt)
    ev.update({1: _pred([[0, 0, 10, 10]], [0.9], [1])})  # cat 1 hit, cat 2 missed
    ev.accumulate()
    ev.summarize()
    per_cat = ev.per_category_ap()
    assert per_cat[1] == pytest.approx(1.0)
    assert per_cat[2] == pytest.approx(0.0)


def test_fuzz_python_vs_native_matcher():
    """1000 random det/gt/crowd/ignore configurations: the pure-python
    match_greedy and the C++ wm_coco_match must agree exactly (VERDICT r1
    item 8 — the mAP gate must not rest on hand-verified cases only)."""
    from wildlifemapper_tpu import native
    from wildlifemapper_tpu.eval.coco_eval import IOU_THRS, match_greedy

    if not native.available():
        pytest.skip("native library unavailable (no toolchain)")

    rng = np.random.default_rng(0)
    for trial in range(1000):
        d = int(rng.integers(1, 9))
        g = int(rng.integers(1, 9))
        # random ious with clusters near thresholds + exact ties
        ious = rng.choice(
            [0.0, 0.3, 0.5, 0.5, 0.55, 0.7, 0.75, 0.9, 0.95, 1.0],
            size=(d, g)).astype(np.float64)
        g_ignore = rng.random(g) < 0.3
        gcrowd = (rng.random(g) < 0.25) & g_ignore  # crowd implies ignore
        want = match_greedy(ious, IOU_THRS, g_ignore, gcrowd)
        got = native.coco_match(ious, IOU_THRS, g_ignore, gcrowd)
        assert got is not None
        for name, a, b in zip(("dtm", "dt_ig", "gtm"), got, want):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"trial {trial} {name}\nious={ious}\n"
                        f"g_ignore={g_ignore} gcrowd={gcrowd}")


def test_fuzz_matcher_invariants():
    """Structural invariants of the greedy matcher on random inputs:
    one-to-one matching of non-crowd GTs, matches only above threshold,
    score-greedy consistency."""
    from wildlifemapper_tpu.eval.coco_eval import IOU_THRS, match_greedy

    rng = np.random.default_rng(1)
    for _ in range(200):
        d = int(rng.integers(1, 12))
        g = int(rng.integers(1, 12))
        ious = rng.random((d, g))
        g_ignore = rng.random(g) < 0.4
        gcrowd = (rng.random(g) < 0.3) & g_ignore
        dtm, dt_ig, gtm = match_greedy(ious, IOU_THRS, g_ignore, gcrowd)
        for ti, thr in enumerate(IOU_THRS):
            # each non-crowd GT matched at most once
            matched = dtm[ti][dtm[ti] > 0] - 1
            noncrowd = matched[~gcrowd[matched]]
            assert len(np.unique(noncrowd)) == len(noncrowd)
            # every match is above the threshold
            for di in range(d):
                if dtm[ti, di] > 0:
                    assert ious[di, dtm[ti, di] - 1] >= min(thr, 1 - 1e-10)
            # dt_ig only on matches to ignored GTs
            ig_idx = np.where(dt_ig[ti])[0]
            for di in ig_idx:
                assert dtm[ti, di] > 0 and g_ignore[dtm[ti, di] - 1]


# ---- independent end-to-end AP oracle --------------------------------------
# pycocotools is not in this image and the C++ wm_coco_match shares the
# matcher spec with coco_eval.py, so this block cross-checks the WHOLE
# pipeline (matching + accumulate + summarize) against a from-first-
# principles evaluator written with a different structure: per-threshold
# re-matching, a single global PR curve, maximum.accumulate envelope.


def _iou_1xg(box, gts):
    lt = np.maximum(box[:2], gts[:, :2])
    rb = np.minimum(box[2:], gts[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a = (box[2] - box[0]) * (box[3] - box[1])
    ag = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    return inter / np.maximum(a + ag - inter, 1e-12)


def _textbook_pr(gt_by_img, det_by_img, iou_thr):
    """(scores, is_tp, npig) for one IoU threshold, one category, no
    crowd/ignore, maxDets=100: classic greedy VOC/COCO matching — each
    detection, in score order, takes the highest-IoU still-free GT of its
    image if that IoU >= thr."""
    rows = []
    npig = 0
    for img in sorted(set(gt_by_img) | set(det_by_img)):
        gts = gt_by_img.get(img, np.zeros((0, 4)))
        npig += len(gts)
        boxes, scores = det_by_img.get(img, (np.zeros((0, 4)), np.zeros(0)))
        order = np.argsort(-scores, kind="mergesort")[:100]
        used = np.zeros(len(gts), dtype=bool)
        for di in order:
            ious = _iou_1xg(boxes[di], gts) if len(gts) else np.zeros(0)
            ious = np.where(used, -1.0, ious)
            best = int(np.argmax(ious)) if len(ious) else -1
            if best >= 0 and ious[best] >= iou_thr:
                used[best] = True
                rows.append((scores[di], True))
            else:
                rows.append((scores[di], False))
    rows.sort(key=lambda r: -r[0])
    if rows:
        s, tp = zip(*rows)
    else:
        s, tp = (), ()
    return np.asarray(tp, dtype=bool), npig


def _textbook_ap_ar(gt_by_img, det_by_img, iou_thr):
    tp, npig = _textbook_pr(gt_by_img, det_by_img, iou_thr)
    if npig == 0:
        return -1.0, -1.0
    if len(tp) == 0:
        return 0.0, 0.0
    tps = np.cumsum(tp)
    rc = tps / npig
    pr = tps / np.arange(1, len(tp) + 1)
    env = np.maximum.accumulate(pr[::-1])[::-1]
    rec_thrs = np.linspace(0.0, 1.0, 101)
    idx = np.searchsorted(rc, rec_thrs, side="left")
    q = np.where(idx < len(env), env[np.minimum(idx, len(env) - 1)], 0.0)
    return float(q.mean()), float(rc[-1])


def test_fuzz_end_to_end_vs_textbook_evaluator():
    """CocoEvaluator's AP/AP50/AP75/AR100 == the independent textbook
    evaluator on random single-category problems (continuous boxes and
    scores -> tie-free, so both tie-breaking conventions agree)."""
    from wildlifemapper_tpu.eval.coco_eval import IOU_THRS

    rng = np.random.default_rng(7)
    for trial in range(25):
        n_imgs = int(rng.integers(1, 6))
        gt_by_img, det_by_img, anns = {}, {}, {}
        for img in range(n_imgs):
            n_gt = int(rng.integers(0, 8))
            xy = rng.uniform(0, 800, (n_gt, 2))
            wh = rng.uniform(4, 120, (n_gt, 2))
            gts = np.concatenate([xy, xy + wh], axis=1)
            gt_by_img[img] = gts
            anns[img] = [_ann(x1, y1, x2 - x1, y2 - y1, 1)
                         for x1, y1, x2, y2 in gts]
            dets = []
            for g in gts:  # jittered copies: mostly-TP candidates
                if rng.random() < 0.75:
                    jit = rng.normal(0, rng.uniform(0.5, 25), 4)
                    b = g + jit
                    dets.append([min(b[0], b[2]), min(b[1], b[3]),
                                 max(b[0], b[2]) + 1, max(b[1], b[3]) + 1])
            for _ in range(int(rng.integers(0, 6))):  # spurious FPs
                xy0 = rng.uniform(0, 800, 2)
                wh0 = rng.uniform(4, 120, 2)
                dets.append([xy0[0], xy0[1], xy0[0] + wh0[0], xy0[1] + wh0[1]])
            dets = np.asarray(dets, dtype=np.float64).reshape(-1, 4)
            det_by_img[img] = (dets, rng.uniform(0.01, 1.0, len(dets)))

        ev = CocoEvaluator(FakeIndex(anns, cats=(1,)))
        ev.update({i: _pred(det_by_img[i][0], det_by_img[i][1],
                            np.ones(len(det_by_img[i][1]), dtype=np.int64))
                   for i in range(n_imgs)})
        ev.accumulate()
        stats = ev.summarize()

        per_thr = [_textbook_ap_ar(gt_by_img, det_by_img, t) for t in IOU_THRS]
        aps = np.asarray([p[0] for p in per_thr])
        ars = np.asarray([p[1] for p in per_thr])
        if np.all(aps == -1.0):  # no GT anywhere this trial
            assert stats["AP"] == -1.0
            continue
        np.testing.assert_allclose(stats["AP"], aps.mean(), atol=1e-9,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(stats["AP50"], aps[0], atol=1e-9)
        np.testing.assert_allclose(stats["AP75"], aps[5], atol=1e-9)
        np.testing.assert_allclose(stats["AR100"], ars.mean(), atol=1e-9)


def test_nonsquare_frame_end_to_end_fix_vs_quirk():
    """GT-as-predictions through postprocess -> COCOeval on a NON-SQUARE
    image: the fixed frame must score AP=1.0, the replicated reference
    h/w-swap quirk (build_sam.py:252) must collapse it. Guards the failure
    mode where a converged checkpoint read AP=0.002 for three rounds on the
    5472x3648 Mara frames while the loss said it had learned (PERF.md
    round 5)."""
    import jax.numpy as jnp

    from wildlifemapper_tpu.eval.postprocess import postprocess

    h, w = 120, 200  # non-square original frame
    gt_xywh = [(10, 20, 40, 30, 1), (100, 60, 60, 40, 1), (150, 10, 30, 50, 1)]
    gt = FakeIndex({7: [_ann(*g) for g in gt_xywh]}, cats=(1,))

    # model frame: normalized cxcywh over the original (the resize is a
    # pure scale, so normalizing over orig == normalizing over content)
    boxes_n = np.asarray(
        [[(x + bw / 2) / w, (y + bh / 2) / h, bw / w, bh / h]
         for x, y, bw, bh, _ in gt_xywh], dtype=np.float32)[None]
    logits = np.full((1, 3, 3), -8.0, dtype=np.float32)
    logits[:, :, 1] = 8.0  # confident class 1, last index is background
    outputs = {"pred_logits": jnp.asarray(logits),
               "pred_boxes": jnp.asarray(boxes_n)}
    orig = jnp.asarray([[h, w]], dtype=jnp.int32)

    aps = {}
    for compat in (False, True):
        dets = postprocess(outputs, orig, hw_swap_compat=compat)
        keep = np.asarray(dets["keep"][0])
        ev = CocoEvaluator(gt)
        ev.update({7: _pred(np.asarray(dets["boxes"][0])[keep],
                            np.asarray(dets["scores"][0])[keep],
                            np.asarray(dets["labels"][0])[keep])})
        ev.accumulate()
        aps[compat] = ev.summarize()["AP"]
    assert aps[False] == pytest.approx(1.0)
    assert aps[True] < 0.5
