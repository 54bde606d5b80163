"""SAM/ViTDet image encoder, TPU-first.

Behavioral parity target: segment_anything/modeling/image_encoder.py
(ImageEncoderViT :17-138, Block :141-204, Attention :207-262). Differences
from the reference are architectural, not behavioral:

  * NHWC end-to-end (convs, LayerNorms, attention reshapes) — no NCHW
    permutes; XLA keeps everything in the TPU-native layout.
  * Windowed attention runs as one batched (B*25, 196, C) attention with a
    materialized 196x196 decomposed rel-pos bias (tiny).
  * Global attention (4096 tokens) can route through a Pallas flash-attention
    kernel that regenerates the rel-pos bias tile-by-tile instead of
    materializing (B, heads, 4096, 4096).
  * Compute dtype is configurable (bf16); params stay float32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import rel_pos as rel_pos_ops
from ..ops import windows as window_ops
from .common import ChannelLayerNorm, MLPBlock

Dtype = Any

# Token-count boundary between the whole-window VMEM kernels (scores held
# entirely in VMEM — only viable for small windows) and the online-softmax
# flash kernels. Patchable in tests to exercise the global path on small
# grids.
GLOBAL_N_THRESHOLD = 1024


class PatchEmbed(nn.Module):
    """16x16/16 conv patch embedding, NHWC in -> (B, H/16, W/16, C)
    (reference image_encoder.py:386-417).

    Lowered as space-to-depth + matmul rather than an XLA convolution: a
    stride==kernel conv is exactly a patch-flatten matmul, and XLA:TPU's
    conv path benched ~10x slower here (27 ms/step across the model's three
    patch convs vs ~3 ms as GEMMs). Params keep the flax Conv layout
    (kh, kw, in, out) so checkpoint conversion is unchanged.
    """

    embed_dim: int
    patch_size: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _PatchProj(patch_size=self.patch_size,
                          embed_dim=self.embed_dim, dtype=self.dtype,
                          name="proj")(x)


class _PatchProj(nn.Module):
    """Space-to-depth + GEMM with nn.Conv-compatible param names/shapes."""

    patch_size: int
    embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.patch_size
        b, hh, ww, c = x.shape
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (p, p, c, self.embed_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.embed_dim,), jnp.float32)
        gh, gw = hh // p, ww // p
        patches = x.reshape(b, gh, p, gw, p, c)
        patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, gh, gw, p * p * c)
        k2 = kernel.reshape(p * p * c, self.embed_dim).astype(self.dtype)
        out = jnp.dot(patches.astype(self.dtype), k2,
                      preferred_element_type=jnp.float32).astype(self.dtype)
        return out + bias.astype(self.dtype)


class RelPosAttention(nn.Module):
    """Multi-head attention with decomposed relative-position bias
    (reference image_encoder.py:207-262).

    Operates on (B, H, W, C) token grids; `input_size` is the static grid the
    rel-pos tables are sized for (window size for windowed blocks, full grid
    for global blocks).
    """

    dim: int
    num_heads: int
    input_size: Tuple[int, int]
    qkv_bias: bool = True
    use_rel_pos: bool = True
    use_flash: bool = False
    attn_impl: str = "packed"
    # Grid the rel-pos *parameters* are sized for (checkpoint shape). When
    # larger than input_size (content-crop mode), the tables are
    # center-sliced: patch resolution is unchanged, so relative distance
    # d maps to the same table row as on the full grid — slicing (not the
    # reference's interpolation, image_encoder.py:328-335, which is meant
    # for resolution changes) preserves the trained embeddings exactly.
    table_size: Optional[Tuple[int, int]] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim ** -0.5

        packed_path = (self.use_flash and self.use_rel_pos
                       and self.attn_impl == "packed")
        qkv_dense = nn.Dense(3 * self.dim, use_bias=self.qkv_bias,
                             dtype=self.dtype, name="qkv")
        if packed_path:
            # rank-3 GEMM: the packed kernels consume (B, N, 3C) directly,
            # and for windowed blocks N=196 is not sublane-aligned — a
            # rank-2 view would force a (B*196, 3C) <-> (B, 196, 3C)
            # retile copy on both sides of the kernel (~0.96 ms/block at
            # B=16, trace r3). XLA lowers a 3-D Dense as a plain batched
            # dot, so the conv-epilogue concern from the MLPBlock
            # docstring does not apply here.
            qkv = qkv_dense(x.reshape(b, h * w, self.dim))
        else:
            # rank-2 GEMM view (see MLPBlock docstring)
            qkv = qkv_dense(x.reshape(-1, self.dim))

        rel_pos_h = rel_pos_w = None
        if self.use_rel_pos:
            ts = self.table_size or self.input_size
            rel_pos_h = self.param("rel_pos_h", nn.initializers.zeros,
                                   (2 * ts[0] - 1, head_dim), jnp.float32)
            rel_pos_w = self.param("rel_pos_w", nn.initializers.zeros,
                                   (2 * ts[1] - 1, head_dim), jnp.float32)
            if ts[0] > self.input_size[0]:
                off = ts[0] - self.input_size[0]
                rel_pos_h = rel_pos_h[off:off + 2 * self.input_size[0] - 1]
            if ts[1] > self.input_size[1]:
                off = ts[1] - self.input_size[1]
                rel_pos_w = rel_pos_w[off:off + 2 * self.input_size[1] - 1]

        if packed_path:
            # v2 fused paths: the kernels consume the qkv GEMM output as-is
            # and split heads in VMEM — no (3, B*heads, N, hd) transpose
            # ever exists (round-1 trace: ~1.9 ms/layer of copies at B=16).
            packed = self._packed_windowed if h * w < GLOBAL_N_THRESHOLD \
                else self._packed_global
            out = packed(qkv, rel_pos_h, rel_pos_w, (h, w), head_dim, scale)
            out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
            return out.reshape(b, h, w, self.dim)
        else:
            # (B, N, 3, heads, hd) -> (3, B*heads, N, hd)
            qkv = qkv.reshape(b, h * w, 3, self.num_heads, head_dim)
            qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(
                3, b * self.num_heads, h * w, head_dim)
            q, k, v = qkv[0], qkv[1], qkv[2]

            rel_h = rel_w = None
            if self.use_rel_pos:
                rel_h, rel_w = rel_pos_ops.decomposed_rel_pos_tables(
                    q, rel_pos_h.astype(self.dtype),
                    rel_pos_w.astype(self.dtype), (h, w), (h, w))

            if self.use_flash and h * w >= GLOBAL_N_THRESHOLD:
                from ..ops.flash_attention import flash_attention_rel_pos
                out = flash_attention_rel_pos(q, k, v, rel_h, rel_w, scale,
                                              (h, w))
            elif self.use_flash and rel_h is not None:
                # v1 small-window path: per-window-head VMEM kernel
                from ..ops.windowed_attention import windowed_attention_rel_pos
                out = windowed_attention_rel_pos(
                    q, k, v, rel_h.reshape(-1, h * w, h),
                    rel_w.reshape(-1, h * w, w), scale, (h, w))
            else:
                attn = jnp.einsum("bqc,bkc->bqk", q * scale, k,
                                  preferred_element_type=jnp.float32)
                if rel_h is not None:
                    attn = rel_pos_ops.add_decomposed_rel_pos_matmul(
                        attn, rel_h, rel_w, (h, w))
                attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
                out = jnp.einsum("bqk,bkc->bqc", attn, v)

            out = out.reshape(b, self.num_heads, h * w, head_dim)
            out = out.transpose(0, 2, 1, 3).reshape(b * h * w, self.dim)

        out = nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        return out.reshape(b, h, w, self.dim)

    def _packed_windowed(self, qkv, rel_pos_h, rel_pos_w, hw, head_dim,
                         scale):
        """v2 kernel dispatch: rel tables projected straight from the packed
        q slice (no per-head q materialization in XLA)."""
        from ..ops.windowed_attention_v2 import (pack_rel_tables,
                                                 windowed_attention_packed)

        h, w = hw
        bw = qkv.shape[0]
        rh_sel = rel_pos_ops.select_rel_pos(
            rel_pos_h.astype(self.dtype), h, h)            # (h, kh, d)
        rw_sel = rel_pos_ops.select_rel_pos(
            rel_pos_w.astype(self.dtype), w, w)            # (w, kw, d)
        q5 = qkv[:, :, :self.dim].reshape(bw, h, w, self.num_heads, head_dim)
        rel_h = jnp.einsum("brced,rkd->berck", q5, rh_sel
                           ).reshape(bw, self.num_heads, h * w, h)
        rel_w = jnp.einsum("brced,ckd->berck", q5, rw_sel
                           ).reshape(bw, self.num_heads, h * w, w)
        rel_hp, rel_wp = pack_rel_tables(rel_h, rel_w, self.num_heads, hw)
        return windowed_attention_packed(qkv, rel_hp, rel_wp, scale,
                                         self.num_heads, hw)

    def _packed_global(self, qkv, rel_pos_h, rel_pos_w, hw, head_dim,
                       scale):
        """v2 global flash dispatch: rel tables projected straight from the
        packed q slice, both lane-packed (token-major) — the layout the
        fused-bias kernel consumes, and the cheapest einsum output order
        (no transposed/padded rhT tensor exists anymore)."""
        from ..ops.flash_attention_v2 import flash_attention_packed

        h, w = hw
        b = qkv.shape[0]
        n = h * w
        rh_sel = rel_pos_ops.select_rel_pos(
            rel_pos_h.astype(self.dtype), h, h)            # (h, kh, d)
        rw_sel = rel_pos_ops.select_rel_pos(
            rel_pos_w.astype(self.dtype), w, w)            # (w, kw, d)
        q5 = qkv[:, :, :self.dim].reshape(b, h, w, self.num_heads, head_dim)
        rh = jnp.einsum("brced,rkd->brcek", q5, rh_sel
                        ).reshape(b, n, self.num_heads * h)
        rw = jnp.einsum("brced,ckd->brcek", q5, rw_sel
                        ).reshape(b, n, self.num_heads * w)
        return flash_attention_packed(qkv, rh, rw, scale, self.num_heads,
                                      hw)


class Block(nn.Module):
    """Pre-norm transformer block with optional windowing
    (reference image_encoder.py:141-204)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = True
    window_size: int = 0          # 0 = global attention
    input_size: Tuple[int, int] = (64, 64)
    table_size: Optional[Tuple[int, int]] = None  # rel-pos param grid
    use_flash: bool = False
    attn_impl: str = "packed"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)

        attn_size = ((self.window_size, self.window_size)
                     if self.window_size > 0 else self.input_size)
        if self.window_size > 0:
            h, w = x.shape[1], x.shape[2]
            x, pad_hw = window_ops.window_partition(x, self.window_size)

        x = RelPosAttention(dim=self.dim, num_heads=self.num_heads,
                            input_size=attn_size, qkv_bias=self.qkv_bias,
                            use_rel_pos=self.use_rel_pos,
                            use_flash=self.use_flash,
                            attn_impl=self.attn_impl,
                            table_size=(None if self.window_size > 0
                                        else self.table_size),
                            dtype=self.dtype, name="attn")(x)

        if self.window_size > 0:
            x = window_ops.window_unpartition(x, self.window_size, pad_hw, (h, w))

        # Named for the remat policy: with remat_blocks, attention outputs
        # are SAVED (the Pallas kernels never re-lower inside the backward)
        # while LN/MLP/residual activations are recomputed — see
        # ImageEncoderViT.
        from jax.ad_checkpoint import checkpoint_name
        x = checkpoint_name(x, "attn_out")
        x = shortcut + x
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = MLPBlock(mlp_dim=int(self.dim * self.mlp_ratio), out_dim=self.dim,
                     dtype=self.dtype, name="mlp",
                     use_fused=(self.use_flash
                                and self.attn_impl == "packed"))(y)
        return x + y


class Neck(nn.Module):
    """1x1 conv -> LN -> 3x3 conv -> LN down to out_chans
    (reference image_encoder.py:105-121). Output NHWC (B, 64, 64, 256)."""

    out_chans: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_chans, kernel_size=(1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="ln1")(x)
        x = nn.Conv(self.out_chans, kernel_size=(3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(x)
        x = ChannelLayerNorm(dtype=self.dtype, name="ln2")(x)
        return x


class ImageEncoderViT(nn.Module):
    """The full encoder: patch embed + abs pos + HFC adaptor + ViT blocks +
    neck (reference image_encoder.py:17-138, wiring at :123-138).

    __call__(images NHWC, hfc NHW1) -> (B, grid, grid, out_chans).
    """

    img_size: int = 1024
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_abs_pos: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    hfc_embed_dim: int = 1024
    hfc_num_heads: int = 8
    hfc_ffn_dim: int = 1024
    hfc_proj_dim: int = 1024
    hfc_dropout: float = 0.1
    use_flash: bool = False
    attn_impl: str = "packed"
    # Content-crop (see ModelConfig.content_size): run the prologue at the
    # full canvas grid, then crop the token grid top-left to content_grid
    # for the transformer blocks + neck. None = full grid. When the *input*
    # is already content-cropped (ModelConfig.crop_prologue), the prologue
    # itself runs at the input grid and this crop is a no-op.
    content_grid: Optional[int] = None
    hfc_scrambled_reshape: bool = True
    # jax.checkpoint each transformer block (see ModelConfig.remat_blocks).
    remat_blocks: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_hfc, *, deterministic: bool = True):
        from .adaptor import CrossAttentionHfcPatch

        grid = self.img_size // self.patch_size   # checkpoint/param grid
        in_grid = x.shape[1] // self.patch_size   # actual input grid
        x = PatchEmbed(embed_dim=self.embed_dim, patch_size=self.patch_size,
                       dtype=self.dtype, name="patch_embed")(x)
        if self.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, grid, grid, self.embed_dim), jnp.float32)
            x = x + pos[:, :in_grid, :in_grid].astype(self.dtype)

        hfc_emb = PatchEmbed(embed_dim=self.hfc_embed_dim,
                             patch_size=self.patch_size,
                             dtype=self.dtype, name="hfc_embed")(x_hfc)
        adaptor_out = CrossAttentionHfcPatch(
            d_model=self.embed_dim, proj_dim=self.hfc_proj_dim,
            num_heads=self.hfc_num_heads, ffn_dim=self.hfc_ffn_dim,
            dropout=self.hfc_dropout, grid_size=grid,
            use_flash=self.use_flash,
            compat_scrambled_reshape=self.hfc_scrambled_reshape,
            dtype=self.dtype, name="hfc_attn")(
                hfc_emb, x, deterministic=deterministic)
        x = adaptor_out + x

        run_grid = in_grid
        if (self.content_grid is not None and self.content_grid < in_grid):
            # Pad tokens beyond the content are bias-only (the collate canvas
            # is zero there, misc.py:50); drop them before the O(N^2) blocks.
            run_grid = self.content_grid
            x = x[:, :run_grid, :run_grid, :]

        # Remat policy: save the attention outputs (a few 10s of MB per
        # block) so the backward recomputes only LN/MLP/residual work — the
        # Pallas attention kernels are not re-lowered into the bwd module
        # (which also sidesteps a remote-compile-helper crash on ViT-L/H
        # flash+full-remat modules, PERF.md), while the big activations
        # (MLP hidden, qkv, scores) are still discarded.
        block_cls = (nn.remat(
            Block,
            policy=jax.checkpoint_policies.save_only_these_names("attn_out"))
            if self.remat_blocks else Block)
        for i in range(self.depth):
            x = block_cls(dim=self.embed_dim, num_heads=self.num_heads,
                          mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                          use_rel_pos=self.use_rel_pos,
                          window_size=(0 if i in self.global_attn_indexes
                                       else self.window_size),
                          input_size=(run_grid, run_grid),
                          table_size=(grid, grid), use_flash=self.use_flash,
                          attn_impl=self.attn_impl,
                          dtype=self.dtype, name=f"blocks_{i}")(x)

        return Neck(out_chans=self.out_chans, dtype=self.dtype, name="neck")(x)
