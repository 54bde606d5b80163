"""Shared machinery for torch-free golden tests (tests/goldens/*.npz).

Golden weights are never stored: both the capture script
(scripts/capture_goldens.py, needs torch + /root/reference) and the
torch-free regression tests regenerate every tensor deterministically
from its state-dict NAME via `golden_value`, so an npz only carries the
(name, shape, is_buffer) metadata plus the reference outputs — a few
hundred KB instead of ~430 MB of ViT-B weights per golden.
"""

from __future__ import annotations

import json
import zlib

import numpy as np


def golden_value(name: str, shape, is_buffer: bool) -> np.ndarray:
    """Deterministic pseudo-weights keyed by the state-dict name, so the
    capture side (torch) and the test side (jax) materialize identical
    tensors without ever shipping them. Buffers (pixel stats, PE gaussian
    matrices) use unit scale like the oracle tests' randomize helpers;
    parameters use an init-like 0.02."""
    r = np.random.default_rng(zlib.crc32(name.encode()))
    scale = 1.0 if is_buffer else 0.02
    return (r.normal(size=tuple(shape)) * scale).astype(np.float32)


def meta_to_state_dict(meta_json) -> dict:
    """Rebuild the numpy state dict recorded by capture_goldens.py."""
    if isinstance(meta_json, np.ndarray):
        meta_json = meta_json.item()
    meta = json.loads(meta_json)
    return {name: golden_value(name, shape, buf)
            for name, shape, buf in meta}


def padded_canvas(seed: int, batch: int = 1, content: int = 768,
                  canvas: int = 1024) -> np.ndarray:
    """The collate-shaped input (misc.py:50): `content`-px random imagery
    zero-padded into a `canvas` NHWC tensor."""
    x = np.zeros((batch, canvas, canvas, 3), np.float32)
    x[:, :content, :content, :] = np.random.default_rng(seed).normal(
        size=(batch, content, content, 3))
    return x


def moments(a: np.ndarray) -> np.ndarray:
    a64 = np.asarray(a, np.float64)
    return np.array([a64.mean(), a64.std(), a64.min(), a64.max()])
