"""Tiler + orthomosaic fusion tests."""

import dataclasses

import numpy as np
import pytest

from wildlifemapper_tpu.data.tiler import (extract_tiles, make_tile_grid,
                                           uncrop_boxes)
from wildlifemapper_tpu.eval.orthomosaic import OrthomosaicDetector, _nms_numpy


def test_grid_covers_image():
    g = make_tile_grid(3648, 5472, tile=1024, overlap=256)
    cover = np.zeros((3648, 5472), dtype=bool)
    for y0, x0 in g.origins:
        assert 0 <= y0 <= 3648 - 1024 and 0 <= x0 <= 5472 - 1024
        cover[y0:y0 + 1024, x0:x0 + 1024] = True
    assert cover.all()


def test_small_image_single_tile():
    g = make_tile_grid(500, 700, tile=1024, overlap=256)
    assert g.origins == ((0, 0),)
    img = np.ones((500, 700, 3), np.uint8)
    tiles = extract_tiles(img, g)
    assert tiles.shape == (1, 1024, 1024, 3)
    assert tiles[0, :500, :700].all() and not tiles[0, 500:].any()


def test_uncrop():
    b = np.asarray([[10.0, 20, 30, 40]])
    out = uncrop_boxes(b, (100, 200))
    np.testing.assert_array_equal(out, [[210, 120, 230, 140]])


def test_nms_numpy():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60.0]])
    scores = np.asarray([0.9, 0.8, 0.7])
    keep = _nms_numpy(boxes, scores, 0.4)
    assert sorted(keep.tolist()) == [0, 2]


def test_orthomosaic_end_to_end():
    """Tiny model over a 2-tile mosaic: seam duplicates fused by NMS."""
    import jax

    from wildlifemapper_tpu.models import WildlifeMapper
    from tests.test_model import tiny_config

    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    params = m.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    det = OrthomosaicDetector(m, params, cfg, tile_batch=2, overlap=16,
                              confidence_threshold=0.0, nms_iou=0.4)
    mosaic = np.random.default_rng(0).integers(0, 255, (100, 150, 3),
                                               dtype=np.uint8)
    out = det.detect(mosaic)
    assert out["boxes"].shape[1] == 4
    # untrained model at threshold 0: detections exist and live in mosaic
    # coordinates
    assert len(out["boxes"]) > 0
    assert (out["boxes"][:, 2] <= 150 + 64).all()


def test_orthomosaic_mesh_sharded_matches_single_device():
    """Tile batches sharded over the 8-device mesh's data axis must give
    the same fused detections as the single-device path (pod-scale mosaic
    inference: tiles ride the data axis, params replicated)."""
    import jax

    from wildlifemapper_tpu.models import WildlifeMapper
    from wildlifemapper_tpu.parallel.mesh import make_mesh
    from tests.test_model import tiny_config

    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    params = m.init(jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32))
    mosaic = np.random.default_rng(1).integers(0, 255, (100, 150, 3),
                                               dtype=np.uint8)
    base = OrthomosaicDetector(m, params, cfg, tile_batch=2, overlap=16,
                               confidence_threshold=0.0, nms_iou=0.4
                               ).detect(mosaic)
    mesh = make_mesh(model_parallel=1)
    det = OrthomosaicDetector(m, params, cfg, tile_batch=2, overlap=16,
                              confidence_threshold=0.0, nms_iou=0.4,
                              mesh=mesh)
    assert det.tile_batch == len(jax.devices())  # rounded up to data size
    out = det.detect(mosaic)
    np.testing.assert_allclose(out["boxes"], base["boxes"], atol=1e-4)
    np.testing.assert_allclose(out["scores"], base["scores"], atol=1e-5)
    np.testing.assert_array_equal(out["labels"], base["labels"])
