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


@functools.lru_cache(maxsize=32)
def _expansion_mats_np(kh: int, kw: int):
    """0/1 matrices turning the axial bias into two matmuls:
    bias[q, kh*KW + kw] = rel_h[q, kh] + rel_w[q, kw]
      = (rel_h @ E + rel_w @ T)[q, :]  with
    E[r, j] = [j // KW == r] (kh, kh*kw), T[r, j] = [j % KW == r] (kw, kh*kw).

    Avoids reshaping attention to a 5D (.., kh, kw) layout whose tiny
    trailing dims get padded to the (8, 128) TPU tile — the naive broadcast
    add costs ~10x the bandwidth of these two small matmuls.
    """
    j = np.arange(kh * kw)
    e = (j[None, :] // kw == np.arange(kh)[:, None]).astype(np.float32)
    t = (j[None, :] % kw == np.arange(kw)[:, None]).astype(np.float32)
    return e, t


def add_decomposed_rel_pos_matmul(attn: jnp.ndarray, rel_h: jnp.ndarray,
                                  rel_w: jnp.ndarray, k_hw) -> jnp.ndarray:
    """attn (B*, N, kh*kw) += bias via expansion matmuls.

    rel_h: (B*, qh, qw, kh) / rel_w: (B*, qh, qw, kw) from
    decomposed_rel_pos_tables.
    """
    kh, kw = k_hw
    bstar, n, _ = attn.shape
    e, t = _expansion_mats_np(kh, kw)
    e = jnp.asarray(e, dtype=rel_h.dtype)
    t = jnp.asarray(t, dtype=rel_w.dtype)
    bias = (jnp.einsum("bqh,hk->bqk", rel_h.reshape(bstar, n, kh), e,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("bqw,wk->bqk", rel_w.reshape(bstar, n, kw), t,
                         preferred_element_type=jnp.float32))
    return attn + bias


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
