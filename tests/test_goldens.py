"""Torch-free parity regression: golden tensors captured from the PyTorch
reference (tests/goldens/*.npz, generated while torch was available) checked
against the JAX modules. Keeps the numerics gate alive in environments
without torch."""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.compat.torch_convert import (map_torch_keys,
                                                     merge_into_params)

GOLDENS = Path(__file__).parent / "goldens"


def _split(npz, prefix):
    sd = {k.split("::", 1)[1]: npz[k] for k in npz.files
          if k.startswith(f"{prefix}_sd::")}
    return npz[f"{prefix}_x"], npz[f"{prefix}_y"], sd


@pytest.mark.parametrize("which,window", [("windowed", 14), ("global", 0)])
def test_vit_block_goldens(which, window):
    npz = np.load(GOLDENS / "vit_blocks.npz")
    x, y, sd = _split(npz, which)

    from wildlifemapper_tpu.models.vit import Block
    blk = Block(dim=64, num_heads=4, window_size=window, input_size=(16, 16))
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    mapped = {k.replace("image_encoder/blocks_0/", ""): v
              for k, v in map_torch_keys(sd, depth=1).items()}
    params, rpt = merge_into_params(params, mapped)
    assert not rpt["missing"]
    out = np.asarray(blk.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, y, atol=2e-5, rtol=1e-4)


def test_decoder_goldens():
    npz = np.load(GOLDENS / "decoder.npz")
    sd = {k.split("::", 1)[1]: npz[k] for k in npz.files if k.startswith("sd::")}

    from wildlifemapper_tpu.models.decoder import BoxDecoder
    dec = BoxDecoder(transformer_dim=32, num_queries=7, num_logits=8,
                     head_hidden_dim=32, head_depth=3, depth=2, num_heads=4,
                     mlp_dim=64)
    emb, pe = jnp.asarray(npz["emb"]), jnp.asarray(npz["pe"])
    params = dec.init(jax.random.PRNGKey(0), emb, pe)
    mapped = {k.replace("box_decoder/", ""): v
              for k, v in map_torch_keys(sd, depth=0).items()}
    params, rpt = merge_into_params(params, mapped)
    assert not rpt["missing"]
    out = dec.apply(params, emb, pe)
    np.testing.assert_allclose(np.asarray(out["pred_logits"]), npz["logits"],
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["pred_boxes"]), npz["boxes"],
                               atol=2e-5, rtol=1e-4)
