"""High-frequency-component (HFC) extraction via an FFT band-stop filter.

TPU-native reimplementation of the reference's `MedSAM.fft`
(network.py:36-57): grayscale -> centered 2-D FFT (norm="forward") -> zero a
central square of the shifted spectrum -> inverse FFT -> |real part|.

Design notes (TPU):
  * Runs on XLA's native FFT; always computed in float32 (FFT in bf16 loses
    too much precision) and cast to the caller's compute dtype afterwards.
  * Instead of materializing a mask and calling fftshift/ifftshift (three
    extra memory passes over a (B, H, W) complex array), we exploit that
    zeroing a centered square of the *shifted* spectrum equals multiplying the
    *unshifted* spectrum by an ifftshift'ed mask — a static 0/1 array folded
    into a single elementwise multiply that XLA fuses into the FFT epilogue.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# ITU-R 601 luma weights used by torchvision's Grayscale (network.py:41).
_GRAY_WEIGHTS = (0.2989, 0.587, 0.114)


@functools.lru_cache(maxsize=8)
def _bandstop_mask(h: int, w: int, rate: float) -> np.ndarray:
    """Static unshifted band-stop mask.

    The reference computes `line = int((w*h*rate)**.5 // 2)` and zeroes
    `[h//2-line:h//2+line, w//2-line:w//2+line]` of the fftshift'ed spectrum
    (network.py:43-45; its `w, h` are actually the last two dims, i.e. rows
    then cols). We build the same mask, then ifftshift it once at trace time.
    """
    line = int((w * h * rate) ** 0.5 // 2)
    mask = np.ones((h, w), dtype=np.float32)
    mask[h // 2 - line:h // 2 + line, w // 2 - line:w // 2 + line] = 0.0
    return np.fft.ifftshift(mask)


def rgb_to_grayscale(images: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) -> (..., H, W) with ITU-R 601 weights."""
    w = jnp.asarray(_GRAY_WEIGHTS, dtype=images.dtype)
    return jnp.tensordot(images, w, axes=([-1], [0]))


def hfc_filter(images: jnp.ndarray, rate: float = 0.125) -> jnp.ndarray:
    """Extract the high-frequency component map.

    Args:
      images: (B, H, W, 3) normalized images (NHWC; the reference applies this
        to the ImageNet-normalized padded canvas).
      rate: band-stop rate; 0.125 zeroes a 362x362 center at 1024x1024.

    Returns:
      (B, H, W, 1) float HFC map in the input dtype.
    """
    orig_dtype = images.dtype
    gray = rgb_to_grayscale(images.astype(jnp.float32))
    h, w = gray.shape[-2], gray.shape[-1]
    mask = jnp.asarray(_bandstop_mask(h, w, rate))

    # norm="forward": scale 1/(h*w) on the forward transform, 1 on inverse.
    spec = jnp.fft.fft2(gray, norm="forward")
    spec = spec * mask
    inv = jnp.fft.ifft2(spec, norm="forward").real
    out = jnp.abs(inv)
    return out[..., None].astype(orig_dtype)
