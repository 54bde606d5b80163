"""Window partition / unpartition as pure reshape+transpose ops.

Reference: image_encoder.py:265-311. On TPU these lower to cheap layout ops
that XLA fuses with the surrounding attention; no data-dependent shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def window_partition(x: jnp.ndarray, window: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> (B * nWin, window, window, C), zero-padding H/W up to a
    multiple of `window` (64 -> 70 for window 14)."""
    b, h, w, c = x.shape
    pad_h = (-h) % window
    pad_w = (-w) % window
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window, window, wp // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(windows: jnp.ndarray, window: int,
                       pad_hw: Tuple[int, int], hw: Tuple[int, int]) -> jnp.ndarray:
    """Inverse of window_partition; crops away the padding."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // ((hp // window) * (wp // window))
    x = windows.reshape(b, hp // window, wp // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]
