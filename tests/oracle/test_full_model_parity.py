"""End-to-end parity: full ViT-B WildlifeMapper vs the reference MedSAM
pipeline (fft -> image_encoder -> mask_decoder) with identical randomized
weights moved through the real converter path (strip/map/merge).

This is the strongest numerics gate available without the released
checkpoint (no egress): if this passes, a user's converted .pth will
reproduce the reference's logits/boxes.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_loader import REFERENCE, _stub_torchvision

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _load_full_reference():
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
        net = importlib.import_module("segment_anything.network")
        return bs, net
    except Exception:
        return None
    finally:
        sys.path.pop(0)


REF = _load_full_reference()
pytestmark = pytest.mark.skipif(REF is None, reason="torch reference unavailable")


@pytest.mark.slow
def test_full_vitb_model_parity():
    import torch

    bs_mod, net_mod = REF
    args = types.SimpleNamespace(set_cost_class=1, set_cost_bbox=5,
                                 set_cost_giou=2, bbox_loss_coef=5,
                                 giou_loss_coef=2, eos_coef=0.1,
                                 device="cpu")
    sam, _, _ = bs_mod.build_sam_vit_b(checkpoint=None, args=args)
    medsam = net_mod.MedSAM(sam.image_encoder, sam.mask_decoder,
                            sam.prompt_encoder)
    medsam.eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in medsam.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.02)
        for b in medsam.buffers():
            b.copy_(torch.randn(b.shape, generator=g))

    # torch state dict exactly as train.py would save it (DDP prefix incl.)
    sd = {f"module.{k}": v for k, v in medsam.state_dict().items()}

    from wildlifemapper_tpu.compat.torch_convert import (map_torch_keys,
                                                         merge_into_params,
                                                         strip_prefixes)
    from wildlifemapper_tpu.config import model_config
    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = model_config("vit_b")  # f32 for exact comparison
    model = WildlifeMapper(cfg)
    x = np.random.default_rng(7).normal(
        size=(1, 1024, 1024, 3)).astype(np.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd_np = {k: v.numpy() for k, v in strip_prefixes(sd).items()}
    mapped = map_torch_keys(sd_np, depth=12)
    params, rpt = merge_into_params(params, mapped)
    assert not rpt["missing"], rpt["missing"][:10]

    out_j = jax.device_get(model.apply(params, jnp.asarray(x)))

    class _Nested:  # NestedTensor shim (misc.py:15): only .tensors is used
        def __init__(self, t):
            self.tensors = t

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        out_t = medsam(_Nested(xt), box=np.zeros((1, 4), np.float32))

    np.testing.assert_allclose(out_j["pred_logits"],
                               out_t["pred_logits"].numpy(),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(out_j["pred_boxes"],
                               out_t["pred_boxes"].numpy(),
                               atol=1e-4, rtol=1e-3)
