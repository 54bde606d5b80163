"""Legacy SAM PromptEncoder compat module — numerics oracle vs the torch
reference (segment_anything/modeling/prompt_encoder.py)."""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wildlifemapper_tpu.compat.prompt_encoder import (
    PromptEncoder, convert_torch_prompt_encoder)

REF = Path("/root/reference/wildlifemapper")


def _init(module, **inputs):
    return module.init(jax.random.PRNGKey(0), **inputs)


def test_shapes_and_no_prompt_dense():
    pe = PromptEncoder(embed_dim=64, image_embedding_size=(16, 16),
                       input_image_size=(256, 256), mask_in_chans=8)
    pts = jnp.asarray(np.random.default_rng(0).uniform(0, 256, (2, 3, 2)),
                      jnp.float32)
    labs = jnp.asarray([[1, 0, -1], [1, 1, 1]], jnp.int32)
    params = _init(pe, points=pts, point_labels=labs)
    sparse, dense = pe.apply(params, points=pts, point_labels=labs)
    # pad slot appended when boxes are absent (prompt_encoder.py:81-85)
    assert sparse.shape == (2, 4, 64)
    assert dense.shape == (2, 16, 16, 64)
    # no mask -> dense is the broadcast no_mask embedding (:165-167)
    np.testing.assert_allclose(
        np.asarray(dense[0, 0, 0]),
        np.asarray(params["params"]["no_mask_embed"][0]), rtol=1e-6)

    boxes = jnp.asarray([[10.0, 20.0, 50.0, 60.0],
                         [0.0, 0.0, 100.0, 100.0]], jnp.float32)
    sparse_b, _ = pe.apply(params, boxes=boxes)
    assert sparse_b.shape == (2, 2, 64)
    # points + boxes: no pad slot
    sparse_pb, _ = pe.apply(params, points=pts, point_labels=labs,
                            boxes=boxes)
    assert sparse_pb.shape == (2, 5, 64)

    dense_pe = pe.apply(params, method=pe.get_dense_pe)
    assert dense_pe.shape == (1, 16, 16, 64)


def _load_ref_module():
    if not REF.exists():
        pytest.skip("reference absent")
    torch = pytest.importorskip("torch")  # noqa: F841
    from tests.oracle.reference_loader import _stub_torchvision
    _stub_torchvision()  # segment_anything imports torchvision box ops
    sys.path.insert(0, str(REF))
    import importlib
    return importlib.import_module(
        "segment_anything.modeling.prompt_encoder")


@pytest.mark.skipif(not REF.exists(), reason="reference absent")
def test_oracle_parity_all_prompt_combos():
    import torch

    ref_mod = _load_ref_module()
    torch.manual_seed(3)
    ref = ref_mod.PromptEncoder(embed_dim=64, image_embedding_size=(16, 16),
                                input_image_size=(256, 256), mask_in_chans=8)
    ref.eval()

    pe = PromptEncoder(embed_dim=64, image_embedding_size=(16, 16),
                       input_image_size=(256, 256), mask_in_chans=8)
    rng = np.random.default_rng(5)
    pts_np = rng.uniform(0, 256, (2, 3, 2)).astype(np.float32)
    labs_np = np.asarray([[1, 0, -1], [1, 1, 0]], np.int64)
    boxes_np = np.asarray([[10, 20, 50, 60], [5, 5, 200, 180]], np.float32)
    masks_np = rng.normal(size=(2, 64, 64, 1)).astype(np.float32)

    params = _init(pe, points=jnp.asarray(pts_np),
                   point_labels=jnp.asarray(labs_np.astype(np.int32)),
                   masks=jnp.asarray(masks_np))
    converted = convert_torch_prompt_encoder(ref.state_dict(),
                                             params["params"])
    params = {"params": converted}

    def run_ref(points=None, boxes=None, masks=None):
        with torch.no_grad():
            s, d = ref(points, boxes, masks)
        return s.detach().numpy(), d.detach().numpy()

    t_pts = (torch.from_numpy(pts_np), torch.from_numpy(labs_np))
    t_boxes = torch.from_numpy(boxes_np)
    t_masks = torch.from_numpy(masks_np.transpose(0, 3, 1, 2))  # NCHW

    combos = [
        dict(points=True, boxes=False, masks=False),
        dict(points=False, boxes=True, masks=False),
        dict(points=True, boxes=True, masks=True),
        dict(points=False, boxes=False, masks=True),
    ]
    for c in combos:
        s_ref, d_ref = run_ref(t_pts if c["points"] else None,
                               t_boxes if c["boxes"] else None,
                               t_masks if c["masks"] else None)
        kwargs = {}
        if c["points"]:
            kwargs["points"] = jnp.asarray(pts_np)
            kwargs["point_labels"] = jnp.asarray(labs_np.astype(np.int32))
        if c["boxes"]:
            kwargs["boxes"] = jnp.asarray(boxes_np)
        if c["masks"]:
            kwargs["masks"] = jnp.asarray(masks_np)
        s_j, d_j = pe.apply(params, **kwargs)
        np.testing.assert_allclose(np.asarray(s_j), s_ref, rtol=1e-4,
                                   atol=1e-5, err_msg=f"sparse {c}")
        np.testing.assert_allclose(
            np.asarray(d_j).transpose(0, 3, 1, 2), d_ref, rtol=1e-4,
            atol=1e-5, err_msg=f"dense {c}")

    # dense PE grid parity (get_dense_pe, prompt_encoder.py:62-71)
    with torch.no_grad():
        pe_ref = ref.get_dense_pe().numpy()
    pe_j = np.asarray(pe.apply(params, method=pe.get_dense_pe))
    np.testing.assert_allclose(pe_j.transpose(0, 3, 1, 2), pe_ref,
                               rtol=1e-4, atol=1e-5)
