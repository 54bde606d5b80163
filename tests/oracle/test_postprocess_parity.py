"""PostProcess parity vs the reference (build_sam.py:212-258) on NON-SQUARE
target sizes: proves `hw_swap_compat=True` replicates the reference's h/w
swap bit-for-bit (including the swapped scaling that collapses mAP on
non-square data — PERF.md round 5) and that scores/labels/keep match."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_loader import REFERENCE, _stub_torchvision

import jax.numpy as jnp  # noqa: E402

from wildlifemapper_tpu.eval.postprocess import postprocess  # noqa: E402


def _load_reference_postprocess():
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
        return bs.PostProcess
    except Exception:
        return None
    finally:
        sys.path.pop(0)


REF_POSTPROCESS = _load_reference_postprocess()
pytestmark = pytest.mark.skipif(REF_POSTPROCESS is None,
                                reason="torch reference unavailable")


@pytest.mark.parametrize("orig_hw", [(3648, 5472), (200, 100), (768, 768)])
def test_postprocess_matches_reference(orig_hw, rng=None):
    import torch

    rng = np.random.default_rng(7)
    b, q, L = 2, 51, 8
    logits = rng.normal(size=(b, q, L)).astype(np.float32) * 3.0
    boxes = rng.uniform(0.1, 0.9, size=(b, q, 4)).astype(np.float32)
    boxes[..., 2:] *= 0.3

    outputs = {"pred_logits": jnp.asarray(logits),
               "pred_boxes": jnp.asarray(boxes)}
    # reference stores orig_size as [h, w] (dataloader_coco.py:269)
    orig = jnp.asarray([list(orig_hw)] * b, dtype=jnp.int32)
    ours = postprocess(outputs, orig, confidence_threshold=0.05,
                       hw_swap_compat=True)

    ref = REF_POSTPROCESS()
    with torch.no_grad():
        ref_out = ref({"pred_logits": torch.from_numpy(logits),
                       "pred_boxes": torch.from_numpy(boxes)},
                      torch.tensor([list(orig_hw)] * b))

    for i in range(b):
        keep = np.asarray(ours["keep"][i])
        r = ref_out[i]
        # the reference returns only above-threshold rows, ragged; ours is
        # fixed-shape (Q,) + keep mask over the same 0.05 threshold
        assert keep.sum() == len(r["scores"])
        np.testing.assert_allclose(np.asarray(ours["scores"][i])[keep],
                                   r["scores"].numpy(), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(ours["labels"][i])[keep],
                                      r["labels"].numpy())
        np.testing.assert_allclose(np.asarray(ours["boxes"][i])[keep],
                                   r["boxes"].numpy(), rtol=1e-4, atol=1e-2)
