"""Legacy SAM prompt encoder (point / box / mask embeddings).

Behavioral parity target: segment_anything/modeling/prompt_encoder.py:16-215
— the FULL SAM PromptEncoder that WildlifeMapper's active path shadows with
its stripped pos_encoder (the reference's own modeling/__init__.py:9 comments
the import out). Rebuilt here as a compat module so SAM-style interactive
prompting (SamPredictor workflows) remains available; the detection path
uses models/pos_embed.py's dense PE instead.

TPU-native differences from the torch original:
  * NHWC mask tensors (B, 4H, 4W, 1) -> dense embeddings (B, H, W, C)
    (the torch module is NCHW); callers coming from torch transpose once
    at the boundary.
  * label-conditional point embeddings are jnp.where selects, not in-place
    index assignment (prompt_encoder.py:87-90) — identical math, jit-safe.
  * absent prompts are Python-level ``None`` (static at trace time), like
    the torch module's ``is None`` checks; each (points/boxes/masks)
    combination is its own compiled program with fixed shapes.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..models.common import ChannelLayerNorm

Dtype = Any


def _pe_encoding(gauss: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Random-Fourier features of [0,1]-normalized coords (..., 2)
    (prompt_encoder.py:186-193)."""
    c = 2.0 * coords - 1.0
    proj = 2.0 * np.pi * (c @ gauss)
    return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class PromptEncoder(nn.Module):
    """Sparse (points+boxes) and dense (mask) prompt embeddings
    (prompt_encoder.py:16-169)."""

    embed_dim: int = 256
    image_embedding_size: Tuple[int, int] = (64, 64)
    input_image_size: Tuple[int, int] = (1024, 1024)
    mask_in_chans: int = 16
    dtype: Dtype = jnp.float32

    def setup(self):
        # PositionEmbeddingRandom's gaussian buffer (scale 1.0,
        # prompt_encoder.py:43,181-184)
        self.pe_gaussian = self.param(
            "pe_gaussian", nn.initializers.normal(stddev=1.0),
            (2, self.embed_dim // 2), jnp.float32)
        # 4 point embeddings: neg point, pos point, box TL corner, box BR
        # corner (:45-47); plus the not-a-point pad embedding (:48)
        self.point_embeddings = self.param(
            "point_embeddings", nn.initializers.normal(stddev=1.0),
            (4, self.embed_dim), jnp.float32)
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(stddev=1.0),
            (1, self.embed_dim), jnp.float32)
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(stddev=1.0),
            (1, self.embed_dim), jnp.float32)
        # mask_downscaling (:51-59): 4x spatial reduction to embed_dim, NHWC
        self.mask_conv1 = nn.Conv(self.mask_in_chans // 4, (2, 2),
                                  strides=(2, 2), padding="VALID",
                                  dtype=self.dtype)
        self.mask_ln1 = ChannelLayerNorm(dtype=self.dtype,
                                         use_fast_variance=False)
        self.mask_conv2 = nn.Conv(self.mask_in_chans, (2, 2), strides=(2, 2),
                                  padding="VALID", dtype=self.dtype)
        self.mask_ln2 = ChannelLayerNorm(dtype=self.dtype,
                                         use_fast_variance=False)
        self.mask_conv3 = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)

    @property
    def mask_input_size(self) -> Tuple[int, int]:
        return (4 * self.image_embedding_size[0],
                4 * self.image_embedding_size[1])

    def get_dense_pe(self) -> jnp.ndarray:
        """(1, H, W, C) dense PE over the embedding grid, pixel-center
        coords (prompt_encoder.py:62-71, 195-206)."""
        h, w = self.image_embedding_size
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        coords = jnp.asarray(np.stack([xx, yy], axis=-1))    # (h, w, 2) x,y
        return _pe_encoding(self.pe_gaussian, coords)[None].astype(self.dtype)

    def _embed_points(self, points: jnp.ndarray, labels: jnp.ndarray,
                      pad: bool) -> jnp.ndarray:
        """(B, N, 2) pixel coords + (B, N) labels -> (B, N[+1], C)
        (prompt_encoder.py:73-91). labels: 1 pos, 0 neg, -1 pad."""
        points = points + 0.5  # pixel centers
        if pad:  # pad slot stands in for the absent box prompt (:81-85)
            b = points.shape[0]
            points = jnp.concatenate(
                [points, jnp.zeros((b, 1, 2), points.dtype)], axis=1)
            labels = jnp.concatenate(
                [labels, -jnp.ones((b, 1), labels.dtype)], axis=1)
        h, w = self.input_image_size
        coords = points / jnp.asarray([w, h], jnp.float32)
        pe = _pe_encoding(self.pe_gaussian, coords.astype(jnp.float32))
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed[0], pe)
        emb = emb + jnp.where(lab == 0, self.point_embeddings[0], 0.0)
        emb = emb + jnp.where(lab == 1, self.point_embeddings[1], 0.0)
        return emb.astype(self.dtype)

    def _embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """(B, 4) or (B, N, 4) xyxy pixel boxes -> (B, 2N, C) corner
        embeddings (prompt_encoder.py:93-100; the torch original takes one
        box per batch row — N>1 generalizes it)."""
        b = boxes.shape[0]
        corners = (boxes + 0.5).reshape(b, -1, 2)            # (B, 2N, 2)
        h, w = self.input_image_size
        coords = corners / jnp.asarray([w, h], jnp.float32)
        pe = _pe_encoding(self.pe_gaussian, coords.astype(jnp.float32))
        n2 = pe.shape[1]
        corner_emb = jnp.where(
            (jnp.arange(n2) % 2 == 0)[None, :, None],
            self.point_embeddings[2], self.point_embeddings[3])
        return (pe + corner_emb).astype(self.dtype)

    def _embed_masks(self, masks: jnp.ndarray) -> jnp.ndarray:
        """(B, 4H, 4W, 1) NHWC masks -> (B, H, W, C)
        (prompt_encoder.py:102-105; GELU is torch's exact-erf variant)."""
        x = self.mask_conv1(masks)
        x = nn.gelu(self.mask_ln1(x), approximate=False)
        x = self.mask_conv2(x)
        x = nn.gelu(self.mask_ln2(x), approximate=False)
        return self.mask_conv3(x)

    def __call__(self, points: Optional[jnp.ndarray] = None,
                 point_labels: Optional[jnp.ndarray] = None,
                 boxes: Optional[jnp.ndarray] = None,
                 masks: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (sparse (B, N, C), dense (B, H, W, C))
        (prompt_encoder.py:128-169)."""
        if points is not None:
            bs = points.shape[0]
        elif boxes is not None:
            bs = boxes.shape[0]
        elif masks is not None:
            bs = masks.shape[0]
        else:
            bs = 1
        sparse = jnp.zeros((bs, 0, self.embed_dim), self.dtype)
        if points is not None:
            assert point_labels is not None, "points require point_labels"
            sparse = jnp.concatenate(
                [sparse, self._embed_points(points, point_labels,
                                            pad=boxes is None)], axis=1)
        if boxes is not None:
            sparse = jnp.concatenate([sparse, self._embed_boxes(boxes)],
                                     axis=1)
        if masks is not None:
            dense = self._embed_masks(masks)
        else:
            h, w = self.image_embedding_size
            dense = jnp.broadcast_to(
                self.no_mask_embed.reshape(1, 1, 1, -1),
                (bs, h, w, self.embed_dim)).astype(self.dtype)
        return sparse, dense


def convert_torch_prompt_encoder(state_dict, params):
    """Map a torch PromptEncoder state_dict (or a full SAM checkpoint's
    ``prompt_encoder.*`` subtree) onto this module's param tree. Torch convs
    are OIHW; flax wants HWIO."""
    import numpy as _np

    def t(k):
        v = state_dict[k]
        return _np.asarray(v.detach().cpu().numpy()
                           if hasattr(v, "detach") else v)

    prefix = ("prompt_encoder."
              if any(k.startswith("prompt_encoder.") for k in state_dict)
              else "")
    p = dict(params)
    p["pe_gaussian"] = t(
        prefix + "pe_layer.positional_encoding_gaussian_matrix")
    p["point_embeddings"] = _np.concatenate(
        [t(f"{prefix}point_embeddings.{i}.weight") for i in range(4)], axis=0)
    p["not_a_point_embed"] = t(prefix + "not_a_point_embed.weight")
    p["no_mask_embed"] = t(prefix + "no_mask_embed.weight")
    for ours, theirs in (("mask_conv1", "mask_downscaling.0"),
                         ("mask_conv2", "mask_downscaling.3"),
                         ("mask_conv3", "mask_downscaling.6")):
        p[ours] = {"kernel": t(f"{prefix}{theirs}.weight"
                               ).transpose(2, 3, 1, 0),
                   "bias": t(f"{prefix}{theirs}.bias")}
    for ours, theirs in (("mask_ln1", "mask_downscaling.1"),
                         ("mask_ln2", "mask_downscaling.4")):
        p[ours] = {"LayerNorm_0": {"scale": t(f"{prefix}{theirs}.weight"),
                                   "bias": t(f"{prefix}{theirs}.bias")}}
    return p
