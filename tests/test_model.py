"""Shape/jit sanity for the full detector on a tiny config."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wildlifemapper_tpu.config import (DecoderConfig, HFCConfig, ViTConfig,
                                       model_config)
from wildlifemapper_tpu.models import WildlifeMapper


def tiny_config(**overrides):
    vit = ViTConfig(embed_dim=64, depth=2, num_heads=2,
                    global_attn_indexes=(1,), window_size=4, out_chans=32)
    return dataclasses.replace(
        model_config("vit_b"), vit=vit, img_size=64, patch_size=16,
        hfc=HFCConfig(embed_dim=32, proj_dim=32, num_heads=2, ffn_dim=32),
        decoder=DecoderConfig(transformer_dim=32, mlp_dim=64, num_queries=7,
                              num_heads=2), **overrides)


def test_forward_shapes_and_jit():
    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 64, 3)),
                    dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, x: m.apply(p, x))(params, x)
    assert out["pred_logits"].shape == (2, 7, 8)
    assert out["pred_boxes"].shape == (2, 7, 4)
    assert out["pred_boxes"].dtype == jnp.float32
    b = np.asarray(out["pred_boxes"])
    assert (b >= 0).all() and (b <= 1).all()


def test_bf16_compute_close_to_f32():
    cfg32 = tiny_config()
    cfg16 = tiny_config(dtype="bfloat16")
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 64, 64, 3)),
                    dtype=jnp.float32)
    m32, m16 = WildlifeMapper(cfg32), WildlifeMapper(cfg16)
    params = m32.init(jax.random.PRNGKey(0), x)
    o32 = m32.apply(params, x)
    o16 = m16.apply(params, x)
    # bf16 compute drifts but must stay in the same ballpark
    assert np.abs(np.asarray(o32["pred_boxes"]) -
                  np.asarray(o16["pred_boxes"])).max() < 0.1


def test_dropout_train_mode_runs():
    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
