"""Postprocess + fixed-shape NMS tests."""

import numpy as np

import jax.numpy as jnp

from wildlifemapper_tpu.eval.postprocess import batched_nms, postprocess


def test_postprocess_scaling_and_swap():
    logits = np.full((1, 3, 8), -5.0, dtype=np.float32)
    logits[0, 0, 2] = 5.0          # confident class 2
    logits[0, 1, 7] = 5.0          # background
    logits[0, 2, 4] = 0.0          # middling
    boxes = np.asarray([[[0.5, 0.5, 0.2, 0.2]] * 3], dtype=np.float32)
    outputs = {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
    orig = jnp.asarray([[200, 100]])  # h=200, w=100

    # compat mode: x scaled by h(200), y by w(100) — the reference's swap
    out = postprocess(outputs, orig, hw_swap_compat=True)
    np.testing.assert_allclose(np.asarray(out["boxes"])[0, 0],
                               [0.4 * 200, 0.4 * 100, 0.6 * 200, 0.6 * 100])
    # fixed mode
    out2 = postprocess(outputs, orig, hw_swap_compat=False)
    np.testing.assert_allclose(np.asarray(out2["boxes"])[0, 0],
                               [0.4 * 100, 0.4 * 200, 0.6 * 100, 0.6 * 200])
    keep = np.asarray(out["keep"][0])
    assert keep[0] and not keep[1]
    assert int(out["labels"][0, 0]) == 2


def test_nms_suppresses_overlaps():
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60],
                          [0, 0, 10, 10]]], dtype=jnp.float32)
    scores = jnp.asarray([[0.9, 0.8, 0.7, 0.6]])
    labels = jnp.asarray([[1, 1, 1, 2]], dtype=jnp.int32)
    keep0 = jnp.ones((1, 4), dtype=bool)

    out = np.asarray(batched_nms(boxes, scores, labels, keep0, 0.4,
                                 class_aware=True))
    # box1 suppressed by box0 (same class, IoU>0.4); box3 survives (class 2)
    assert out[0].tolist() == [True, False, True, True]

    out2 = np.asarray(batched_nms(boxes, scores, labels, keep0, 0.4,
                                  class_aware=False))
    assert out2[0].tolist() == [True, False, True, False]


def test_nms_respects_initial_keep():
    boxes = jnp.asarray([[[0, 0, 10, 10], [50, 50, 60, 60]]], dtype=jnp.float32)
    scores = jnp.asarray([[0.9, 0.8]])
    labels = jnp.zeros((1, 2), dtype=jnp.int32)
    keep0 = jnp.asarray([[False, True]])
    out = np.asarray(batched_nms(boxes, scores, labels, keep0, 0.5))
    assert out[0].tolist() == [False, True]
