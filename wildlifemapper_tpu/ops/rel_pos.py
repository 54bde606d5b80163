"""Decomposed relative-position bias for ViTDet-style attention.

Reference: image_encoder.py:314-383 (get_rel_pos / add_decomposed_rel_pos,
from MViTv2). For a (qh, qw) query grid attending a (kh, kw) key grid the bias
decomposes per axis:

    bias[q, k] = <q_vec, Rh[dy]> + <q_vec, Rw[dx]>

We precompute the two small projections rel_h = q @ Rh^T (…, qh, qw, kh) and
rel_w = q @ Rw^T (…, qh, qw, kw); the O(N^2) broadcast-add either materializes
(small windowed case) or is regenerated tile-by-tile inside the flash kernel
(global case) — never a stored (4096, 4096) bias.

Our static shapes always have q_size == k_size, so the reference's linear
interpolation path (image_encoder.py:328-335) never triggers; we still keep
the coordinate math general.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def rel_pos_index(q_size: int, k_size: int) -> np.ndarray:
    """Static (q_size, k_size) gather indices into a (2*max-1, C) rel-pos table
    (reference image_encoder.py:340-344)."""
    q_ratio = max(k_size / q_size, 1.0)
    k_ratio = max(q_size / k_size, 1.0)
    q_coords = np.arange(q_size)[:, None] * q_ratio
    k_coords = np.arange(k_size)[None, :] * k_ratio
    rel = (q_coords - k_coords) + (k_size - 1) * k_ratio
    return rel.astype(np.int64)


def select_rel_pos(rel_pos: jnp.ndarray, q_size: int, k_size: int) -> jnp.ndarray:
    """Gather the (q_size, k_size, C) table from the (2*max-1, C) parameter."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        # Linear interpolation to the needed length (align_corners=False
        # resample, matching F.interpolate mode='linear').
        src_len = rel_pos.shape[0]
        pos = (jnp.arange(max_rel_dist) + 0.5) * (src_len / max_rel_dist) - 0.5
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, src_len - 1)
        hi = jnp.clip(lo + 1, 0, src_len - 1)
        frac = jnp.clip(pos - lo, 0.0, 1.0)[:, None]
        rel_pos = rel_pos[lo] * (1.0 - frac) + rel_pos[hi] * frac
    idx = jnp.asarray(rel_pos_index(q_size, k_size))
    return rel_pos[idx]


def decomposed_rel_pos_tables(q: jnp.ndarray, rel_pos_h: jnp.ndarray,
                              rel_pos_w: jnp.ndarray, q_hw, k_hw):
    """Project queries onto the axial rel-pos tables.

    Args:
      q: (B*, qh*qw, C) per-head queries (unscaled).
      rel_pos_h / rel_pos_w: (2*S-1, C) parameters.
      q_hw, k_hw: (h, w) grid sizes.

    Returns:
      rel_h: (B*, qh, qw, kh), rel_w: (B*, qh, qw, kw)
    """
    qh, qw = q_hw
    kh, kw = k_hw
    rh = select_rel_pos(rel_pos_h, qh, kh)  # (qh, kh, C)
    rw = select_rel_pos(rel_pos_w, qw, kw)  # (qw, kw, C)
    rq = q.reshape(q.shape[0], qh, qw, q.shape[-1])
    rel_h = jnp.einsum("bhwc,hkc->bhwk", rq, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", rq, rw)
    return rel_h, rel_w


def add_decomposed_rel_pos(attn: jnp.ndarray, q: jnp.ndarray,
                           rel_pos_h: jnp.ndarray, rel_pos_w: jnp.ndarray,
                           q_hw, k_hw) -> jnp.ndarray:
    """Materializing variant: attn (B*, qh*qw, kh*kw) += rel_h ⊕ rel_w.

    Used for windowed attention where N = 196 and the bias is tiny; the global
    path goes through the flash kernel instead.
    """
    qh, qw = q_hw
    kh, kw = k_hw
    rel_h, rel_w = decomposed_rel_pos_tables(q, rel_pos_h, rel_pos_w, q_hw, k_hw)
    attn = attn.reshape(attn.shape[0], qh, qw, kh, kw)
    attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
    return attn.reshape(attn.shape[0], qh * qw, kh * kw)
