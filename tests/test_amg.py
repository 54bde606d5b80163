"""AMG compat-surface tests (point grids, RLE round-trip, stability score,
crop boxes)."""

import numpy as np

import jax.numpy as jnp

from wildlifemapper_tpu.compat import amg


def test_point_grid():
    g = amg.build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() == 1 / 8 and g.max() == 1 - 1 / 8
    layers = amg.build_all_layer_point_grids(8, 2, 2)
    assert [len(l) for l in layers] == [64, 16, 4]


def test_rle_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(20):
        m = rng.random((13, 17)) > rng.uniform(0.2, 0.8)
        rle = amg.mask_to_rle(m)
        assert rle["size"] == [13, 17]
        assert sum(rle["counts"]) == 13 * 17
        assert amg.area_from_rle(rle) == int(m.sum())
        np.testing.assert_array_equal(amg.rle_to_mask(rle), m)


def test_rle_edge_cases():
    ones = np.ones((3, 3), bool)
    rle = amg.mask_to_rle(ones)
    assert rle["counts"][0] == 0  # leading-zero convention
    np.testing.assert_array_equal(amg.rle_to_mask(rle), ones)
    zeros = np.zeros((3, 3), bool)
    np.testing.assert_array_equal(amg.rle_to_mask(amg.mask_to_rle(zeros)),
                                  zeros)


def test_stability_score():
    logits = jnp.asarray([[[0.6, 0.6], [0.6, -1.0]],   # stable-ish mask
                          [[0.05, -0.05], [-1.0, -1.0]]])  # fragile mask
    s = amg.calculate_stability_score(logits, 0.0, 0.1)
    assert s.shape == (2,)
    assert float(s[0]) == 1.0        # same mask at both thresholds
    assert float(s[1]) == 0.0        # hi-threshold mask empty, lo has 1 px
    empty = amg.calculate_stability_score(jnp.full((1, 2, 2), -5.0), 0.0, 0.1)
    assert float(empty[0]) == 1.0    # both empty -> 1.0


def test_batched_mask_to_box():
    m = np.zeros((2, 3, 8, 8), bool)
    m[0, 1, 2:5, 3:7] = True
    boxes = np.asarray(amg.batched_mask_to_box(jnp.asarray(m)))
    assert boxes.shape == (2, 3, 4)
    np.testing.assert_array_equal(boxes[0, 1], [3, 2, 6, 4])
    np.testing.assert_array_equal(boxes[0, 0], [0, 0, 0, 0])


def test_crop_boxes():
    boxes, layers = amg.generate_crop_boxes((100, 200), 2, 0.25)
    assert boxes[0] == [0, 0, 200, 100] and layers[0] == 0
    assert layers.count(1) == 4 and layers.count(2) == 16
    for b in boxes:
        assert 0 <= b[0] < b[2] <= 200 and 0 <= b[1] < b[3] <= 100
    # layer-1 crops tile the full image
    cover = np.zeros((100, 200), bool)
    for b, l in zip(boxes, layers):
        if l == 1:
            cover[b[1]:b[3], b[0]:b[2]] = True
    assert cover.all()
    # uncrop round-trip
    bx = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    out = np.asarray(amg.uncrop_boxes_xyxy(bx, [10, 20, 50, 60]))
    np.testing.assert_array_equal(out, [[11, 22, 13, 24]])
