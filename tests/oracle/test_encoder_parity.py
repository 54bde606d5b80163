"""Golden parity: JAX encoder/decoder vs the PyTorch reference modules with
identical weights. These are the numerics gate for mAP parity (BASELINE.md).

Reduced-size configs keep CPU runtime sane while still covering every code
path (window padding 16->28, global + windowed blocks, rel-pos, adaptor).
The adaptor test must run at grid 64 because the reference hardcodes its
positional embedding to (1, C, 64, 64) (image_encoder.py:484).
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


def _randomize_torch(module, seed=0):
    import torch
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for b in module.buffers():
            b.copy_(torch.randn(b.shape, generator=g))
    return module


@pytest.mark.slow
def test_vit_block_parity():
    """One windowed + one global block, grid 16 (window pad 16->28)."""
    import torch

    ref_enc = REF["image_encoder"]
    torch_attn = ref_enc.Block(
        dim=64, num_heads=4, qkv_bias=True, use_rel_pos=True,
        window_size=14, input_size=(16, 16))
    _randomize_torch(torch_attn, 1)

    sd = torch_state_dict_numpy(torch_attn, "image_encoder.blocks.0")
    from wildlifemapper_tpu.models.vit import Block

    jb = Block(dim=64, num_heads=4, window_size=14, input_size=(16, 16))
    x = np.random.default_rng(0).normal(size=(2, 16, 16, 64)).astype(np.float32)
    params = jb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mapped = map_torch_keys(sd, depth=1)
    # strip the image_encoder/blocks_0 prefix for the standalone module
    mapped = {k.replace("image_encoder/blocks_0/", ""): v
              for k, v in mapped.items() if "blocks_0" in k}
    params, rpt = merge_into_params(params, mapped)
    assert not rpt["missing"], rpt["missing"]

    out_j = np.asarray(jb.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        out_t = torch_attn(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_global_block_parity():
    import torch

    ref_enc = REF["image_encoder"]
    torch_blk = ref_enc.Block(dim=64, num_heads=4, qkv_bias=True,
                              use_rel_pos=True, window_size=0,
                              input_size=(16, 16))
    _randomize_torch(torch_blk, 2)
    sd = torch_state_dict_numpy(torch_blk, "image_encoder.blocks.0")

    from wildlifemapper_tpu.models.vit import Block
    jb = Block(dim=64, num_heads=4, window_size=0, input_size=(16, 16))
    x = np.random.default_rng(1).normal(size=(2, 16, 16, 64)).astype(np.float32)
    params = jb.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mapped = {k.replace("image_encoder/blocks_0/", ""): v
              for k, v in map_torch_keys(sd, depth=1).items() if "blocks_0" in k}
    params, rpt = merge_into_params(params, mapped)
    assert not rpt["missing"], rpt["missing"]

    out_j = np.asarray(jb.apply(params, jnp.asarray(x)))
    with torch.no_grad():
        out_t = torch_blk(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out_j, out_t, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_decoder_parity():
    """TwoWayTransformer + heads vs reference MaskDecoder (grid 8)."""
    import torch

    ref_box = REF["box_decoder"]
    ref_twt = REF["transformer"]
    t = ref_twt.TwoWayTransformer(depth=2, embedding_dim=32, mlp_dim=64,
                                  num_heads=4)
    dec = ref_box.MaskDecoder(transformer_dim=32, transformer=t,
                              num_multimask_outputs=6, iou_head_depth=3,
                              iou_head_hidden_dim=32)
    _randomize_torch(dec, 3)
    sd = torch_state_dict_numpy(dec, "mask_decoder")

    from wildlifemapper_tpu.models.decoder import BoxDecoder
    jd = BoxDecoder(transformer_dim=32, num_queries=7, num_logits=8,
                    head_hidden_dim=32, head_depth=3, depth=2, num_heads=4,
                    mlp_dim=64)
    g = 8
    rng_np = np.random.default_rng(2)
    emb = rng_np.normal(size=(2, g, g, 32)).astype(np.float32)
    pe = rng_np.normal(size=(g, g, 32)).astype(np.float32)
    params = jd.init(jax.random.PRNGKey(0), jnp.asarray(emb), jnp.asarray(pe))
    mapped = {k.replace("box_decoder/", ""): v
              for k, v in map_torch_keys(sd, depth=0).items()}
    params, rpt = merge_into_params(params, mapped)
    assert not rpt["missing"], rpt["missing"]

    out_j = jd.apply(params, jnp.asarray(emb), jnp.asarray(pe))
    with torch.no_grad():
        # reference expects NCHW image embedding and (1, C, H, W) PE
        emb_t = torch.from_numpy(np.transpose(emb, (0, 3, 1, 2)))
        pe_t = torch.from_numpy(np.transpose(pe, (2, 0, 1))[None])
        out_t = dec(image_embeddings=emb_t, image_pe=pe_t,
                    sparse_prompt_embeddings=None,
                    dense_prompt_embeddings=None, multimask_output=False,
                    hfc_embed=None)
    np.testing.assert_allclose(np.asarray(out_j["pred_logits"]),
                               out_t["pred_logits"].numpy(), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_j["pred_boxes"]),
                               out_t["pred_boxes"].numpy(), atol=2e-5, rtol=1e-4)


def test_dense_pe_parity():
    import torch

    ref_pos = REF["pos_encoder"]
    pe_layer = ref_pos.PositionEmbeddingRandom(num_pos_feats=16)
    _randomize_torch(pe_layer, 4)

    from wildlifemapper_tpu.models.pos_embed import PositionEmbeddingRandom
    jp = PositionEmbeddingRandom(num_pos_feats=16, grid_size=8)
    params = jp.init(jax.random.PRNGKey(0))
    gm = pe_layer.positional_encoding_gaussian_matrix.numpy()
    params = {"params": {"gaussian_matrix": jnp.asarray(gm)}}
    out_j = np.asarray(jp.apply(params))  # (8, 8, 32)
    with torch.no_grad():
        out_t = pe_layer((8, 8)).numpy()  # (32, 8, 8)
    np.testing.assert_allclose(out_j, np.transpose(out_t, (1, 2, 0)),
                               atol=1e-5, rtol=1e-5)


def test_hfc_parity():
    """HFC band-stop filter vs a torch oracle mirroring network.py:36-57."""
    import torch

    x = np.random.default_rng(3).normal(size=(2, 3, 64, 64)).astype(np.float32)
    xt = torch.from_numpy(x)
    # Oracle: grayscale (ITU-R 601 as torchvision Grayscale), forward-norm
    # fft2, zero centered square, inverse, |real|.
    gray = (0.2989 * xt[:, 0] + 0.587 * xt[:, 1] + 0.114 * xt[:, 2])[:, None]
    h, w = gray.shape[-2:]
    line = int((h * w * 0.125) ** 0.5 // 2)
    mask = torch.ones_like(gray)
    mask[:, :, h // 2 - line:h // 2 + line, w // 2 - line:w // 2 + line] = 0
    f = torch.fft.fftshift(torch.fft.fft2(gray, norm="forward")) * mask
    inv = torch.abs(torch.fft.ifft2(torch.fft.ifftshift(f), norm="forward").real)

    from wildlifemapper_tpu.ops.hfc import hfc_filter
    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    out_j = np.asarray(hfc_filter(x_nhwc, 0.125))[..., 0]
    np.testing.assert_allclose(out_j, inv[:, 0].numpy(), atol=1e-5, rtol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("dims", [(1024, 16), (1280, 16)])  # ViT-L / ViT-H
def test_block_parity_large_dims(dims):
    """Windowed + global block parity at ViT-L/H head dims (VERDICT r1
    item 9: only depth-12/dim-768 paths were exercised before). Grid 16
    bounds CPU runtime; the L/H-specific risk is the 1024/1280-dim,
    16-head split, which is dim-dependent, not grid-dependent."""
    import torch

    dim, heads = dims
    ref_enc = REF["image_encoder"]
    from wildlifemapper_tpu.models.vit import Block

    for window, seed in ((14, 3), (0, 4)):
        torch_blk = ref_enc.Block(dim=dim, num_heads=heads, qkv_bias=True,
                                  use_rel_pos=True, window_size=window,
                                  input_size=(16, 16))
        _randomize_torch(torch_blk, seed)
        sd = torch_state_dict_numpy(torch_blk, "image_encoder.blocks.0")
        jb = Block(dim=dim, num_heads=heads, window_size=window,
                   input_size=(16, 16))
        x = np.random.default_rng(seed).normal(
            size=(1, 16, 16, dim)).astype(np.float32)
        params = jb.init(jax.random.PRNGKey(0), jnp.asarray(x))
        mapped = {k.replace("image_encoder/blocks_0/", ""): v
                  for k, v in map_torch_keys(sd, depth=1).items()
                  if "blocks_0" in k}
        params, rpt = merge_into_params(params, mapped)
        assert not rpt["missing"], rpt["missing"]
        out_j = np.asarray(jb.apply(params, jnp.asarray(x)))
        with torch.no_grad():
            out_t = torch_blk(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(out_j, out_t, atol=5e-5, rtol=1e-4,
                                   err_msg=f"window={window} dim={dim}")
