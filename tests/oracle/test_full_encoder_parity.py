"""Full ImageEncoderViT parity (patch embed + abs pos + HFC adaptor + blocks
+ neck) vs the torch reference, at img_size=1024 / grid 64.

grid 64 is forced by the reference's hardcoded adaptor pos_embed
(1, 1024, 64, 64) (image_encoder.py:484); channel dims are shrunk to keep
CPU runtime tolerable, but the adaptor's internal 1024-dim projections are
likewise hardcoded in the reference, so this test is the expensive one.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from reference_loader import load_reference_modeling, torch_state_dict_numpy

REF = load_reference_modeling()
pytestmark = pytest.mark.skipif(REF is None, reason="torch reference unavailable")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from wildlifemapper_tpu.compat.torch_convert import (  # noqa: E402
    map_torch_keys, merge_into_params)


@pytest.mark.slow
def test_full_encoder_parity():
    import torch

    ref_enc = REF["image_encoder"]
    depth = 2
    tenc = ref_enc.ImageEncoderViT(
        img_size=1024, patch_size=16, embed_dim=32, depth=depth, num_heads=2,
        mlp_ratio=2.0, out_chans=16, qkv_bias=True, use_rel_pos=True,
        window_size=14, global_attn_indexes=(1,))
    tenc.eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in tenc.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    sd = torch_state_dict_numpy(tenc, "image_encoder")

    from wildlifemapper_tpu.models.vit import ImageEncoderViT
    jenc = ImageEncoderViT(
        img_size=1024, patch_size=16, embed_dim=32, depth=depth, num_heads=2,
        mlp_ratio=2.0, out_chans=16, window_size=14, global_attn_indexes=(1,),
        hfc_embed_dim=1024, hfc_num_heads=8, hfc_ffn_dim=1024,
        hfc_proj_dim=1024, hfc_dropout=0.1)

    rng_np = np.random.default_rng(5)
    x = rng_np.normal(size=(1, 1024, 1024, 3)).astype(np.float32)
    hfc = rng_np.normal(size=(1, 1024, 1024, 1)).astype(np.float32)

    params = jenc.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(hfc))
    mapped = {k.replace("image_encoder/", "", 1): v
              for k, v in map_torch_keys(sd, depth=depth).items()}
    params, rpt = merge_into_params(params, mapped)
    assert not rpt["missing"], rpt["missing"]

    out_j = np.asarray(jenc.apply(params, jnp.asarray(x), jnp.asarray(hfc),
                                  deterministic=True))
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ht = torch.from_numpy(np.transpose(hfc, (0, 3, 1, 2)))
        out_t = tenc(xt, ht).numpy()  # (B, C, 64, 64)
    np.testing.assert_allclose(out_j, np.transpose(out_t, (0, 2, 3, 1)),
                               atol=5e-5, rtol=1e-4)
