"""Import the PyTorch reference's `segment_anything.modeling` package as a
parity oracle. Skips cleanly when torch or the reference tree is unavailable.

Only modules with torch-only imports are loadable (image_encoder, box_decoder,
transformer, pos_encoder, common, matcher); network.py / dataloader need
torchvision which this image lacks.
"""

import importlib
import sys
from pathlib import Path

REFERENCE = Path("/root/reference/wildlifemapper")


def _stub_torchvision():
    """Install a minimal torchvision stub so the reference package imports.

    Only `ops.boxes.box_area` and `transforms.functional.resize/to_pil_image`
    are referenced on the import path we exercise.
    """
    if "torchvision" in sys.modules:
        return
    import types

    import torch

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.99.0"
    ops = types.ModuleType("torchvision.ops")
    boxes_mod = types.ModuleType("torchvision.ops.boxes")

    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    boxes_mod.box_area = box_area
    ops.boxes = boxes_mod
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")

    def _unavailable(*a, **k):
        raise RuntimeError("torchvision stub: not implemented")

    functional.resize = _unavailable
    functional.to_pil_image = _unavailable
    transforms.functional = functional

    class Grayscale:
        def __call__(self, x):
            w = torch.tensor([0.2989, 0.587, 0.114], dtype=x.dtype)
            return torch.einsum("bchw,c->bhw", x, w)[:, None]

    transforms.Grayscale = Grayscale
    tv.ops = ops
    tv.transforms = transforms
    for name, mod in ((
        "torchvision", tv), ("torchvision.ops", ops),
        ("torchvision.ops.boxes", boxes_mod),
        ("torchvision.transforms", transforms),
        ("torchvision.transforms.functional", functional)):
        sys.modules[name] = mod


def load_reference_modeling():
    if not REFERENCE.exists():
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    _stub_torchvision()
    sys.path.insert(0, str(REFERENCE))
    try:
        mod = importlib.import_module("segment_anything.modeling.image_encoder")
        box = importlib.import_module("segment_anything.modeling.box_decoder")
        twt = importlib.import_module("segment_anything.modeling.transformer")
        pos = importlib.import_module("segment_anything.modeling.pos_encoder")
        return {"image_encoder": mod, "box_decoder": box,
                "transformer": twt, "pos_encoder": pos}
    except Exception:
        return None
    finally:
        sys.path.pop(0)


def torch_state_dict_numpy(module, prefix):
    """state_dict -> {prefix.key: np.ndarray}"""
    return {f"{prefix}.{k}": v.detach().numpy()
            for k, v in module.state_dict().items()}
