"""Query-based detection decoder: TwoWayTransformer + class/box heads.

Behavioral parity targets:
  * TwoWayTransformer / TwoWayAttentionBlock / downsampled Attention —
    segment_anything/modeling/transformer.py:16-240.
  * BoxDecoder ("MaskDecoder") — box_decoder.py:16-149: 51 learned query
    tokens run against the 64x64 image embedding + dense PE, then 3-layer MLP
    heads emit (B, 51, 8) class logits and (B, 51, 4) sigmoid cxcywh boxes.

TPU-first notes: image embeddings flow as (B, N, C) token batches (no
NCHW flatten/permute round-trips); all attentions are batched einsums sized
for the MXU (51 query tokens are padded implicitly by XLA).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .common import MLPBlock, MLPHead

Dtype = Any


class DownsampleAttention(nn.Module):
    """Attention with separate q/k/v projections and optional internal-dim
    downsampling (reference transformer.py:185-240)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v):
        internal = self.embedding_dim // self.downsample_rate
        hd = internal // self.num_heads
        b, nq, _ = q.shape
        nk = k.shape[1]

        q = nn.Dense(internal, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal, dtype=self.dtype, name="v_proj")(v)

        q = q.reshape(b, nq, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqc,bhkc->bhqk", q, k,
                          preferred_element_type=jnp.float32) / (hd ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, internal)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """Query self-attn -> query->image cross-attn -> MLP -> image->query
    cross-attn, PE re-added at each stage (reference transformer.py:109-182)."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        if self.skip_first_layer_pe:
            queries = DownsampleAttention(
                embedding_dim=self.embedding_dim, num_heads=self.num_heads,
                dtype=self.dtype, name="self_attn")(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = DownsampleAttention(
                embedding_dim=self.embedding_dim, num_heads=self.num_heads,
                dtype=self.dtype, name="self_attn")(q, q, queries)
            queries = queries + attn_out
        queries = nn.LayerNorm(dtype=self.dtype, name="norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampleAttention(
            embedding_dim=self.embedding_dim, num_heads=self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(dtype=self.dtype, name="norm2")(queries)

        mlp_out = MLPBlock(mlp_dim=self.mlp_dim, out_dim=self.embedding_dim,
                           act=nn.relu, dtype=self.dtype, name="mlp")(queries)
        queries = queries + mlp_out
        queries = nn.LayerNorm(dtype=self.dtype, name="norm3")(queries)

        q = queries + query_pe
        k = keys + key_pe
        attn_out = DownsampleAttention(
            embedding_dim=self.embedding_dim, num_heads=self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype, name="cross_attn_image_to_token")(k, q, queries)
        keys = keys + attn_out
        keys = nn.LayerNorm(dtype=self.dtype, name="norm4")(keys)

        return queries, keys


class TwoWayTransformer(nn.Module):
    """(reference transformer.py:16-106)"""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embedding, image_pe, point_embedding,
                 return_intermediate: bool = False):
        """image_embedding/image_pe: (B, N, C) tokens; point_embedding:
        (B, Nq, C). Returns (queries, keys) or, with return_intermediate,
        (queries, keys, [per-layer query states]) for aux losses."""
        queries = point_embedding
        keys = image_embedding
        intermediate = []

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim, num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype, name=f"layers_{i}")(
                    queries, keys, point_embedding, image_pe)
            if return_intermediate:
                intermediate.append(queries)

        q = queries + point_embedding
        k = keys + image_pe
        attn_out = DownsampleAttention(
            embedding_dim=self.embedding_dim, num_heads=self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype, name="final_attn_token_to_image")(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(dtype=self.dtype, name="norm_final_attn")(queries)
        if return_intermediate:
            return queries, keys, intermediate
        return queries, keys


class BoxDecoder(nn.Module):
    """51-query DETR-style detection head (reference box_decoder.py:16-149).

    Note the reference keeps a vestigial 1-slot `iou_token` embedding that is
    concatenated nowhere — its `mask_tokens` (num_queries) are the only
    queries (box_decoder.py:128-147). We keep only the real query embedding;
    the converter drops `iou_token`.
    """

    transformer_dim: int = 256
    num_queries: int = 51
    num_logits: int = 8           # 6 classes + unused id 0 + background
    head_hidden_dim: int = 256
    head_depth: int = 3
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    # Deep supervision on intermediate decoder layers. The reference carries
    # this plumbing but never enables it (box_decoder.py:26,105-106,
    # aux_loss defaults False); here it is functional.
    aux_loss: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image_embeddings, image_pe):
        """image_embeddings: (B, G, G, C) from the encoder neck;
        image_pe: (G, G, C) dense positional grid.

        Returns dict(pred_logits=(B, Nq, num_logits), pred_boxes=(B, Nq, 4)).
        """
        b, g, _, c = image_embeddings.shape
        tokens = self.param("query_tokens", nn.initializers.normal(stddev=1.0),
                            (self.num_queries, self.transformer_dim), jnp.float32)
        tokens = jnp.broadcast_to(tokens.astype(self.dtype)[None],
                                  (b, self.num_queries, self.transformer_dim))

        src = image_embeddings.reshape(b, g * g, c)
        pe = jnp.broadcast_to(
            image_pe.reshape(1, g * g, self.transformer_dim).astype(self.dtype),
            (b, g * g, self.transformer_dim))

        twt = TwoWayTransformer(
            depth=self.depth, embedding_dim=self.transformer_dim,
            num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            attention_downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype, name="transformer")
        class_head = MLPHead(hidden_dim=self.head_hidden_dim,
                             out_dim=self.num_logits,
                             num_layers=self.head_depth,
                             dtype=self.dtype, name="class_embed")
        bbox_head = MLPHead(hidden_dim=self.head_hidden_dim, out_dim=4,
                            num_layers=self.head_depth, sigmoid_output=True,
                            dtype=self.dtype, name="bbox_embed")

        if self.aux_loss:
            hs, _, inter = twt(src, pe, tokens, return_intermediate=True)
            out = {"pred_logits": class_head(hs), "pred_boxes": bbox_head(hs)}
            out["aux_outputs"] = [
                {"pred_logits": class_head(h), "pred_boxes": bbox_head(h)}
                for h in inter[:-1]]
            return out
        hs, _ = twt(src, pe, tokens)
        return {"pred_logits": class_head(hs), "pred_boxes": bbox_head(hs)}
