"""HFC -> patch cross-attention adaptor.

Behavioral parity target: CrossAttentionHfcPatch
(image_encoder.py:452-516): project both streams to proj_dim with 1x1 convs,
add a learned positional embedding to the HFC stream, run one
MultiheadAttention layer (query=patch, key/value=hfc), a post-norm FFN, and
project back to the ViT embed dim. The output is residually added to the
patch embeddings by the caller (image_encoder.py:130-131).

TPU-first notes: 1x1 convs become Dense layers over the channel axis of NHWC
grids (identical math, no layout churn); attention is batched (B, N, C)
instead of torch's (N, B, C) sequence-first layout.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class MultiheadAttention(nn.Module):
    """Plain softmax MHA matching torch.nn.MultiheadAttention semantics
    (packed qkv projection + out projection, scale = head_dim^-0.5,
    dropout on attention weights). With use_flash, the deterministic path
    routes through the Pallas flash kernel (zero rel-pos bias) so the
    (B, heads, N, N) score matrix never materializes."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    use_flash: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, *, deterministic: bool = True):
        b, nq, _ = query.shape
        nk = key.shape[1]
        hd = self.dim // self.num_heads

        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(value)

        use_flash = (self.use_flash
                     and (self.dropout == 0.0 or deterministic))
        if use_flash:
            # Packed kernel: consumes the projection GEMM outputs directly
            # (a Dense output is already head-packed along C) — no XLA-side
            # head transposes and no zero-bias square-grid hack like the
            # old v1-flash route needed.
            from ..ops.cross_attention import cross_attention_packed

            out = cross_attention_packed(q, k, v, hd ** -0.5,
                                         self.num_heads)
            return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)

        q = q.reshape(b, nq, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, nk, self.num_heads, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqc,bhkc->bhqk", q * (hd ** -0.5), k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.dropout)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkc->bhqc", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)


class CrossAttentionHfcPatch(nn.Module):
    d_model: int = 768            # ViT embed dim (residual target)
    proj_dim: int = 1024
    num_heads: int = 8
    ffn_dim: int = 1024
    dropout: float = 0.1
    grid_size: int = 64
    use_flash: bool = False
    # The reference reinterprets the (B, HW, F) token tensor as (B, F, H, W)
    # *without a transpose* before proj_back (`.reshape(b, -1, h, w)`,
    # image_encoder.py:512) — scrambling tokens across channels. The released
    # weights were trained through this scramble, so checkpoint-compatible
    # eval must replicate it. Set False for the mathematically intended
    # (token-preserving) projection when training from scratch.
    compat_scrambled_reshape: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hfc_embed, patch_embed, *, deterministic: bool = True):
        """hfc_embed: (B, G, G, hfc_dim); patch_embed: (B, G, G, d_model).

        Returns (B, G, G, d_model) to be residually added by the caller.
        """
        b, g, _, _ = hfc_embed.shape

        # Learned positional embedding, added to the projected HFC stream only
        # (image_encoder.py:484,494). Stored NHWC; the torch checkpoint's
        # (1, C, 64, 64) layout is transposed by the converter. Sliced
        # top-left when the input grid is content-cropped (crop_prologue).
        pos = self.param("pos_embed", nn.initializers.zeros,
                         (1, self.grid_size, self.grid_size, self.proj_dim),
                         jnp.float32)

        hfc = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj_hfc")(hfc_embed)
        hfc = hfc + pos[:, :g, :g].astype(self.dtype)
        patch = nn.Dense(self.proj_dim, dtype=self.dtype, name="proj_patch")(patch_embed)

        hfc = hfc.reshape(b, g * g, self.proj_dim)
        patch = patch.reshape(b, g * g, self.proj_dim)

        src2 = MultiheadAttention(dim=self.proj_dim, num_heads=self.num_heads,
                                  dropout=self.dropout,
                                  use_flash=self.use_flash, dtype=self.dtype,
                                  name="cross_attn")(
                                      patch, hfc, hfc, deterministic=deterministic)
        src2 = nn.Dropout(rate=self.dropout)(src2, deterministic=deterministic)
        patch = nn.LayerNorm(dtype=self.dtype, name="norm1")(patch + src2)

        # FFN with the reference's exact (slightly unusual) residual order
        # (image_encoder.py:506-509).
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(patch)
        y = nn.relu(y)
        y = nn.Dropout(rate=self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear2")(y)
        patch_drop = nn.Dropout(rate=self.dropout)(patch, deterministic=deterministic)
        out = nn.LayerNorm(dtype=self.dtype, name="norm2")(y + patch_drop)

        if self.compat_scrambled_reshape:
            # Row-major reinterpret (B, HW, F) -> (B, F, H, W), then to NHWC:
            # exactly the reference's no-transpose reshape + 1x1 conv.
            out = out.reshape(b, self.ffn_dim, g, g).transpose(0, 2, 3, 1)
        else:
            out = out.reshape(b, g, g, self.ffn_dim)
        return nn.Dense(self.d_model, dtype=self.dtype, name="proj_back")(out)
