"""Set-criterion parity vs the reference's SetCriterion + HungarianMatcher
(build_sam.py:62-210, matcher.py) on random predictions/targets."""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_loader import REFERENCE, _stub_torchvision

import jax.numpy as jnp  # noqa: E402

from wildlifemapper_tpu.config import MatchCriterionConfig  # noqa: E402
from wildlifemapper_tpu.train.criterion import set_criterion  # noqa: E402


def _load_reference_criterion():
    if not REFERENCE.exists():
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    _stub_torchvision()
    sys.path.insert(0, str(REFERENCE))
    try:
        import importlib
        bs = importlib.import_module("segment_anything.build_sam")
        matcher = importlib.import_module("segment_anything.modeling.matcher")
        return bs, matcher
    except Exception:
        return None
    finally:
        sys.path.pop(0)


REF = _load_reference_criterion()
pytestmark = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


@pytest.mark.parametrize("sizes", [(3, 7, 0), (5, 12, 2), (40, 60, 51)])
def test_criterion_matches_reference(sizes, rng):
    import torch

    bs_mod, matcher_mod = REF
    n1, n2, n3 = sizes
    b, q, t_pad, num_classes = 3, 51, 64, 7

    logits = rng.normal(size=(b, q, num_classes + 1)).astype(np.float32)
    boxes = rng.uniform(0.2, 0.8, size=(b, q, 4)).astype(np.float32)
    boxes[..., 2:] *= 0.2  # keep w/h sane

    counts = [n1, n2, n3]
    tgt_labels = np.zeros((b, t_pad), dtype=np.int64)
    tgt_boxes = np.full((b, t_pad, 4), 0.5, dtype=np.float32)
    valid = np.zeros((b, t_pad), dtype=bool)
    torch_targets = []
    for i, n in enumerate(counts):
        lbl = rng.integers(1, 7, size=n)
        bx = np.stack([rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
                       rng.uniform(0.02, 0.1, n), rng.uniform(0.02, 0.1, n)],
                      axis=-1).astype(np.float32)
        tgt_labels[i, :n] = lbl
        tgt_boxes[i, :n] = bx
        valid[i, :n] = True
        torch_targets.append({
            "labels": torch.from_numpy(lbl.astype(np.int64)),
            "boxes": torch.from_numpy(bx)})

    # ours
    cfg = MatchCriterionConfig()
    ours = set_criterion(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        {"labels": jnp.asarray(tgt_labels.astype(np.int32)),
         "boxes": jnp.asarray(tgt_boxes), "valid": jnp.asarray(valid)},
        cfg, num_classes=num_classes)

    # reference
    matcher = matcher_mod.HungarianMatcher(cost_class=1, cost_bbox=5, cost_giou=2)
    crit = bs_mod.SetCriterion(
        num_classes, matcher=matcher,
        weight_dict={"loss_ce": 3, "loss_bbox": 5, "loss_giou": 2},
        eos_coef=0.1, losses=["labels", "boxes", "cardinality"])
    with torch.no_grad():
        ref = crit({"pred_logits": torch.from_numpy(logits),
                    "pred_boxes": torch.from_numpy(boxes)}, torch_targets)

    np.testing.assert_allclose(float(ours["loss_ce"]),
                               float(ref["loss_ce"]), rtol=1e-4)
    np.testing.assert_allclose(float(ours["loss_bbox"]),
                               float(ref["loss_bbox"]), rtol=1e-4)
    np.testing.assert_allclose(float(ours["loss_giou"]),
                               float(ref["loss_giou"]), rtol=1e-4)
    np.testing.assert_allclose(float(ours["cardinality_error"]),
                               float(ref["cardinality_error"]), rtol=1e-5)
    np.testing.assert_allclose(float(ours["class_error"]),
                               float(ref["class_error"]), rtol=1e-4, atol=1e-3)
    total_ref = 3 * float(ref["loss_ce"]) + 5 * float(ref["loss_bbox"]) \
        + 2 * float(ref["loss_giou"])
    np.testing.assert_allclose(float(ours["loss"]), total_ref, rtol=1e-4)
