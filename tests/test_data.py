"""Data pipeline tests against the real bundled annotations + synthetic
images, plus transform-level checks."""

import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from wildlifemapper_tpu.data.loader import (CocoDetectionDataset, DataLoader,
                                            build_dataset)
from wildlifemapper_tpu.data.transforms import (
    PreprocessConfig, boxes_to_normalized_cxcywh, flip, pad_targets,
    preprocess_example, resize_keep_aspect, target_from_annotations)

REF_ANN = Path("/root/reference/coco_annotations/val.json")


def test_resize_semantics():
    # 5472x3648 with RandomResize([768], max_size=768): shorter side would
    # overshoot, so the longer side caps at 768 -> (768, 512)
    assert resize_keep_aspect((5472, 3648), 768, 768) == (768, 512)
    assert resize_keep_aspect((768, 768), 768, 768) == (768, 768)
    assert resize_keep_aspect((100, 200), 768, 768) == (384, 768)


def test_target_conversion_clamps_and_filters():
    anns = [
        {"bbox": [10, 10, 20, 20], "category_id": 3, "iscrowd": 0},
        {"bbox": [-5, -5, 8, 8], "category_id": 1, "iscrowd": 0},   # clamped
        {"bbox": [50, 50, 0, 10], "category_id": 2, "iscrowd": 0},  # degenerate
        {"bbox": [5, 5, 10, 10], "category_id": 4, "iscrowd": 1},   # crowd
    ]
    t = target_from_annotations(anns, 100, 100)
    assert len(t["labels"]) == 2
    assert t["boxes"][1][0] == 0.0  # clamped at 0


def test_vertical_flip_quirk():
    img = np.zeros((4, 4, 3), dtype=np.float32)
    img[0, :, 0] = 1.0  # top row marked
    boxes = np.asarray([[0.5, 0.25, 0.2, 0.1]], dtype=np.float32)
    fimg, fboxes = flip(img, boxes, vertical=True)
    assert fimg[3, :, 0].sum() == 4.0  # row moved to bottom
    np.testing.assert_allclose(fboxes[0], [0.5, 0.75, 0.2, 0.1])
    # horizontal variant updates cx instead
    _, hboxes = flip(img, boxes, vertical=False)
    np.testing.assert_allclose(hboxes[0], [0.5, 0.25, 0.2, 0.1] * np.ones(4)
                               * [0, 1, 1, 1] + [0.5, 0, 0, 0])


def test_preprocess_example_shapes():
    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (3648, 5472, 3), np.uint8))
    anns = [{"bbox": [100, 200, 50, 40], "category_id": 2, "iscrowd": 0}]
    cfg = PreprocessConfig()
    ex = preprocess_example(img, anns, 7, cfg)
    assert ex["image"].shape == (1024, 1024, 3)
    assert ex["image"].dtype == np.float32
    # content occupies 512 rows x 768 cols; padding is exactly zero
    assert np.abs(ex["image"][512:, :, :]).max() == 0.0
    assert np.abs(ex["image"][:512, 768:, :]).max() == 0.0
    assert ex["boxes"].shape == (128, 4) and ex["valid"].sum() == 1
    np.testing.assert_array_equal(ex["orig_size"], [3648, 5472])
    np.testing.assert_array_equal(ex["size"], [512, 768])
    # box normalized against the resized 768x512 content
    b = ex["boxes"][0]
    scale = 768 / 5472
    np.testing.assert_allclose(
        b, [(100 + 25) * scale / 768, (200 + 20) * scale / 512,
            50 * scale / 768, 40 * scale / 512], rtol=1e-5)


def test_vendored_annotation_fallback(tmp_path):
    """A missing plain .json resolves to the gzipped vendored bundle, and
    the gz index matches the reference JSON exactly (repo must work
    standalone — VERDICT r3 §2.2)."""
    from wildlifemapper_tpu.data.coco import (ASSETS_DIR, CocoIndex,
                                              resolve_ann_file)

    assert (ASSETS_DIR / "val.json.gz").exists()
    resolved = resolve_ann_file(str(tmp_path / "nonexistent" / "val.json"))
    assert resolved.endswith("val.json.gz")
    idx = CocoIndex(resolved)
    assert len(idx) > 0 and idx.categories
    if REF_ANN.exists():
        ref_idx = CocoIndex(str(Path(REF_ANN).parent / "val.json"))
        assert idx.ids == ref_idx.ids
        assert idx.max_anns_per_image() == ref_idx.max_anns_per_image()
        assert idx.dataset["annotations"] == ref_idx.dataset["annotations"]


def test_partial_dataset_dir_is_hard_error(tmp_path):
    """A coco_path that has SOME split files but not the requested one must
    raise, not silently substitute the vendored Mara split — training on
    the user's data while scoring per-epoch val against different images
    would read AP~0 with no failure."""
    from wildlifemapper_tpu.data.coco import resolve_ann_file

    (tmp_path / "train.json").write_text('{"images": [], "annotations": []}')
    with pytest.raises(FileNotFoundError, match="partially-present"):
        resolve_ann_file(str(tmp_path / "val.json"))


def test_load_ann_json_reads_vendored_gz(tmp_path):
    """load_ann_json is the gz-aware loader every script must use; a plain
    json.load(open(...)) breaks on the vendored bundle."""
    from wildlifemapper_tpu.data.coco import load_ann_json

    d = load_ann_json(str(tmp_path / "absent" / "val.json"))
    assert d["images"] and d["annotations"]


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_synthetic_size_scales_render():
    """DataConfig.synthetic_size renders tiles at the requested size with
    annotations rescaled to match (scaled-proxy experiments)."""
    from wildlifemapper_tpu.config import DataConfig
    from wildlifemapper_tpu.data.loader import build_dataset

    dc = DataConfig(synthetic=True, synthetic_size=256, resize_size=192,
                    canvas_size=256, flip_prob=0.0)
    ds = build_dataset("val", dc)
    ex = ds.get(0)
    assert ex["image"].shape == (256, 256, 3)
    assert ex["valid"].any()
    # boxes normalized to the resized content: all within [0, 1]
    b = ex["boxes"][ex["valid"]]
    assert (b >= 0).all() and (b <= 1).all()


def test_scaled_synthetic_index_matches_rendered_frame():
    """With synthetic_size, `dataset.index` (the GT that evaluate() scores
    against) must live in the rendered frame, not the annotation file's
    original one — perfect predictions read from the index itself must
    score AP 1.0. Regression: the unscaled index made every scaled-proxy
    eval read AP=0 (round 4)."""
    from wildlifemapper_tpu.config import DataConfig
    from wildlifemapper_tpu.data.loader import build_dataset
    from wildlifemapper_tpu.eval.coco_eval import CocoEvaluator

    dc = DataConfig(synthetic=True, synthetic_size=256, resize_size=192,
                    canvas_size=256, flip_prob=0.0)
    ds = build_dataset("val", dc)
    some = [i for i in ds.index.ids[:16] if ds.index.annotations(i)]
    assert some, "bundled val split should have annotated images"
    preds = {}
    for iid in some:
        info = ds.index.image_info(iid)
        assert info["width"] == info["height"] == 256
        anns = ds.index.annotations(iid)
        boxes = np.array([[a["bbox"][0], a["bbox"][1],
                           a["bbox"][0] + a["bbox"][2],
                           a["bbox"][1] + a["bbox"][3]] for a in anns])
        assert (boxes >= 0).all() and (boxes <= 256).all(), \
            "index annotations must be in the rendered 256px frame"
        preds[iid] = {"boxes": boxes,
                      "scores": np.ones(len(anns), np.float32),
                      "labels": np.array([a["category_id"] for a in anns])}
    ev = CocoEvaluator(ds.index)
    ev.update(preds)
    ev.accumulate()
    assert ev.summarize()["AP"] >= 0.99


def test_pad_targets_truncates():
    boxes = np.random.default_rng(0).uniform(size=(100, 4)).astype(np.float32)
    labels = np.ones(100, dtype=np.int32)
    with pytest.raises(ValueError, match="exceed"):  # lossy unless opted in
        pad_targets(boxes, labels, 64)
    with pytest.warns(RuntimeWarning, match="truncating"):
        b, l, v = pad_targets(boxes, labels, 64, allow_truncate=True)
    assert b.shape == (64, 4) and v.sum() == 64


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_real_annotations_synthetic_images():
    ds = CocoDetectionDataset(str(REF_ANN), None, PreprocessConfig(),
                              synthetic=True, synthetic_size=512)
    ex = ds.get(0)
    assert ex["image"].shape == (1024, 1024, 3)
    assert ex["valid"].any()

    loader = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True)
    batch = next(iter(loader.epoch(0)))
    assert batch["image"].shape == (2, 1024, 1024, 3)
    assert batch["boxes"].shape == (2, 128, 4)
    assert batch["batch_valid"].all()


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_synthetic_render_cache_is_exact():
    """The raw-stage cache must not change emitted examples (flip happens
    after the cache boundary, so compare with flip disabled)."""
    cfg = PreprocessConfig(flip_prob=0.0)
    cold = CocoDetectionDataset(str(REF_ANN), None, cfg,
                                synthetic=True, synthetic_size=512)
    warm = CocoDetectionDataset(str(REF_ANN), None, cfg,
                                synthetic=True, synthetic_size=512)
    warm.get(3)  # populate the cache
    assert 3 in warm._synth_cache
    a, b = cold.get(3), warm.get(3)  # warm hit vs uncached render
    for k in a:
        assert (a[k] == b[k]).all(), k


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_loader_sharding_partitions_epoch():
    ds = CocoDetectionDataset(str(REF_ANN), None, PreprocessConfig(),
                              synthetic=True, synthetic_size=256)
    seen = []
    for rank in range(2):
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1,
                            process_index=rank, process_count=2)
        ids = [int(i) for b in loader.epoch(3) for i in b["image_id"]]
        seen.append(set(ids))
    # shards are disjoint up to the DistributedSampler-style pad
    overlap = seen[0] & seen[1]
    assert len(overlap) <= 4  # only the wrap-around pad can repeat
    assert len(seen[0] | seen[1]) > 100


def test_pad_targets_no_silent_loss_on_bundled_dataset():
    """DataConfig.max_targets=None (the default) must auto-size the cap from
    the annotation file — the densest bundled train image (id 633) has 118
    boxes and the reference trains on ragged, UNTRUNCATED targets
    (dataloader_coco.py:253-270). An explicit undersized cap must ERROR
    rather than silently drop GT; truncation is opt-in and warns."""
    import collections
    import json
    import warnings

    from wildlifemapper_tpu.config import DataConfig, MatchCriterionConfig
    from wildlifemapper_tpu.data.loader import CocoDetectionDataset
    from wildlifemapper_tpu.data.transforms import (PreprocessConfig,
                                                    pad_targets)

    assert DataConfig.max_targets is None  # auto-size by default

    cfg_path = Path(DataConfig.coco_path) / "train.json"
    if not cfg_path.exists():
        pytest.skip("bundled annotations absent")
    anns = json.loads(cfg_path.read_text())["annotations"]
    densest = max(collections.Counter(a["image_id"] for a in anns).values())
    assert densest <= MatchCriterionConfig.max_targets

    # max_targets=None resolves from the annotation file at construction
    ds = CocoDetectionDataset(str(cfg_path), None,
                              PreprocessConfig(max_targets=None),
                              synthetic=True)
    assert ds.preprocess.max_targets is not None
    assert ds.preprocess.max_targets >= densest
    assert ds.preprocess.max_targets % 8 == 0
    # mosaic composes 4 tiles -> 4x worst case
    ds_m = CocoDetectionDataset(str(cfg_path), None,
                                PreprocessConfig(max_targets=None,
                                                 use_mosaic=True),
                                synthetic=True)
    assert ds_m.preprocess.max_targets >= 4 * densest

    boxes = np.random.default_rng(0).random((densest, 4)).astype(np.float32)
    labels = np.ones(densest, np.int32)

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any warning -> failure
        b, l, v = pad_targets(boxes, labels, ds.preprocess.max_targets)
    assert int(v.sum()) == densest
    np.testing.assert_array_equal(b[:densest], boxes)

    # undersized cap: hard error by default, lossy-with-warning on opt-in
    with pytest.raises(ValueError, match="exceed"):
        pad_targets(boxes, labels, 64)
    with pytest.warns(RuntimeWarning, match="truncating 118"):
        _, _, v64 = pad_targets(boxes, labels, 64, allow_truncate=True)
    assert int(v64.sum()) == 64


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_worker_modes_deterministic_and_equal():
    """serial, thread, and process (fork) workers must produce identical
    batches for the same seed — augmentation rngs are per-example, so
    completion order cannot matter."""
    ds = CocoDetectionDataset(str(REF_ANN), None,
                              PreprocessConfig(flip_prob=0.5),
                              synthetic=True, synthetic_size=256)

    def first_batches(num_workers, mode):
        loader = DataLoader(ds, batch_size=3, shuffle=True, seed=7,
                            drop_last=True, num_workers=num_workers,
                            worker_mode=mode)
        out = []
        it = loader.epoch(0)
        for _ in range(2):
            out.append(next(it))
        loader.close()
        return out

    # num_workers>0 paths share the per-example child-seed scheme (the
    # serial path consumes the epoch rng sequentially — a different but
    # equally deterministic stream)
    base = first_batches(1, "thread")
    for nw, mode in ((2, "thread"), (1, "process"), (2, "process")):
        got = first_batches(nw, mode)
        for b0, b1 in zip(base, got):
            for k in b0:
                np.testing.assert_array_equal(b1[k], b0[k], err_msg=f"{mode}/{k}")
