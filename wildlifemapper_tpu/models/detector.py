"""WildlifeMapper top-level detector.

Behavioral parity target: MedSAM.forward (network.py:59-87) — extract the
HFC map, run the HFC-augmented ViT encoder, then the query-based detection
decoder against the dense random-Fourier PE. The reference's box-prompt input
is dead code (the prompt-encoder call is commented out, network.py:73-78), so
the model takes images only.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.hfc import hfc_filter
from .decoder import BoxDecoder
from .pos_embed import PositionEmbeddingRandom
from .vit import ImageEncoderViT


class WildlifeMapper(nn.Module):
    """images NHWC (B, img, img, 3), normalized -> {pred_logits, pred_boxes}."""

    config: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, *,
                 deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        dtype = cfg.compute_dtype

        if cfg.crop_prologue and cfg.content_size is not None:
            # From-scratch mode: the whole network (HFC filter included)
            # runs on the content pixels; the zero-pad canvas never exists
            # on device. See ModelConfig.crop_prologue.
            images = images[:, :cfg.content_size, :cfg.content_size, :]

        # HFC runs in f32 (FFT precision), result cast to the compute dtype.
        hfc = hfc_filter(images.astype(jnp.float32), cfg.hfc.rate).astype(dtype)
        images = images.astype(dtype)

        emb = ImageEncoderViT(
            img_size=cfg.img_size, patch_size=cfg.patch_size,
            embed_dim=cfg.vit.embed_dim, depth=cfg.vit.depth,
            num_heads=cfg.vit.num_heads, mlp_ratio=cfg.vit.mlp_ratio,
            out_chans=cfg.vit.out_chans, qkv_bias=cfg.vit.qkv_bias,
            use_abs_pos=cfg.vit.use_abs_pos, use_rel_pos=cfg.vit.use_rel_pos,
            window_size=cfg.vit.window_size,
            global_attn_indexes=cfg.vit.global_attn_indexes,
            hfc_embed_dim=cfg.hfc.embed_dim, hfc_num_heads=cfg.hfc.num_heads,
            hfc_ffn_dim=cfg.hfc.ffn_dim, hfc_proj_dim=cfg.hfc.proj_dim,
            hfc_dropout=cfg.hfc.dropout, use_flash=cfg.use_flash_attention,
            attn_impl=cfg.attn_impl, content_grid=cfg.content_grid,
            hfc_scrambled_reshape=cfg.hfc.compat_scrambled_reshape,
            remat_blocks=cfg.remat_blocks,
            dtype=dtype, name="image_encoder")(
                images, hfc, deterministic=deterministic)

        pe = PositionEmbeddingRandom(
            num_pos_feats=cfg.decoder.transformer_dim // 2,
            grid_size=cfg.grid_size, dtype=dtype, name="pos_encoder")()
        if cfg.content_grid is not None and cfg.content_grid < cfg.grid_size:
            # Content-crop: keep each content token's PE bit-identical to the
            # full-canvas grid (generated at grid_size, sliced top-left).
            pe = pe[:cfg.content_grid, :cfg.content_grid]

        out = BoxDecoder(
            transformer_dim=cfg.decoder.transformer_dim,
            num_queries=cfg.decoder.num_queries, num_logits=cfg.num_logits,
            head_hidden_dim=cfg.decoder.head_hidden_dim,
            head_depth=cfg.decoder.head_depth, depth=cfg.decoder.depth,
            num_heads=cfg.decoder.num_heads, mlp_dim=cfg.decoder.mlp_dim,
            attention_downsample_rate=cfg.decoder.attention_downsample_rate,
            aux_loss=cfg.decoder.aux_loss,
            dtype=dtype, name="box_decoder")(emb, pe)

        # Heads' outputs in f32 for a numerically stable loss/postprocess.
        result = {"pred_logits": out["pred_logits"].astype(jnp.float32),
                  "pred_boxes": out["pred_boxes"].astype(jnp.float32)}
        if "aux_outputs" in out:
            result["aux_outputs"] = [
                {k: v.astype(jnp.float32) for k, v in a.items()}
                for a in out["aux_outputs"]]
        return result
