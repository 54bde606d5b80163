"""Random-Fourier-feature dense positional encoding.

Behavioral parity target: pos_encoder.py:36-70 (PositionEmbeddingRandom via
the stripped PromptEncoder.get_dense_pe, pos_encoder.py:24-33). The gaussian
matrix is a *buffer* in torch (never trained, but stored in checkpoints); here
it is a param initialized from the model PRNG and frozen by the optimizer
mask (train/optimizer.py), and the converter overwrites it with the
checkpoint's values.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any


class PositionEmbeddingRandom(nn.Module):
    num_pos_feats: int = 128      # embed_dim // 2
    grid_size: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self):
        """Returns the dense PE grid (grid, grid, 2*num_pos_feats)."""
        gauss = self.param("gaussian_matrix", nn.initializers.normal(stddev=1.0),
                           (2, self.num_pos_feats), jnp.float32)
        g = self.grid_size
        # Pixel-center coords normalized to [0, 1] (pos_encoder.py:63-67).
        coords_1d = (np.arange(g, dtype=np.float32) + 0.5) / g
        yx = np.stack(np.meshgrid(coords_1d, coords_1d, indexing="ij"), axis=-1)
        coords = jnp.asarray(yx[..., ::-1].copy())          # (g, g, 2) as (x, y)
        coords = 2.0 * coords - 1.0
        proj = 2.0 * np.pi * (coords @ gauss)               # (g, g, F)
        pe = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        return pe.astype(self.dtype)
