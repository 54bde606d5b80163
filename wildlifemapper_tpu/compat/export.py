"""Model export for serving — the TPU-native analog of the reference's ONNX
export surface (utils/onnx.py / SamOnnxModel, part of the vestigial L9 SAM
stack).

Uses jax.export to serialize the jitted forward into a portable StableHLO
artifact that any XLA runtime (TPU/GPU/CPU, PJRT C API) can load — the
deployment story ONNX plays for the torch stack.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def export_forward(model, params, batch_size: Optional[int] = 1,
                   img_size: int = 1024) -> bytes:
    """Serialize `model.apply(params, images)` to StableHLO bytes.

    batch_size=None exports with a symbolic batch dimension (shape
    polymorphism): one artifact serves any batch size instead of one
    executable per serving batch. Spatial dims stay static — the encoder's
    window partitioning and rel-pos tables are shape-specialized by design.
    """
    from jax import export as jax_export

    def fn(params, images):
        return model.apply(params, images)

    if batch_size is None:
        (b,) = jax_export.symbolic_shape("b")
        x = jax.ShapeDtypeStruct((b, img_size, img_size, 3), jnp.float32)
    else:
        x = jax.ShapeDtypeStruct((batch_size, img_size, img_size, 3),
                                 jnp.float32)
    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                          params)
    exported = jax_export.export(jax.jit(fn))(p_spec, x)
    return exported.serialize()


def save_exported(model, params, path: str, batch_size: Optional[int] = 1,
                  img_size: int = 1024) -> Path:
    data = export_forward(model, params, batch_size, img_size)
    out = Path(path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_bytes(data)
    return out


def load_exported(path: str):
    """Deserialize and return a callable running the exported program."""
    from jax import export as jax_export

    exported = jax_export.deserialize(Path(path).read_bytes())
    return exported.call
