"""Capture golden tensors from the PyTorch reference into tests/goldens/.

Run while torch + /root/reference are available (they are not repo
dependencies); the outputs keep the numerics gate alive in a torch-less
image (VERDICT r4 #3). Weights are never stored — both this script and
tests/test_goldens.py regenerate them name-deterministically via
tests/golden_common.golden_value, so each npz holds only (name, shape,
is_buffer) metadata + inputs-by-seed + reference outputs.

Goldens produced (mirroring tests/oracle/* coverage):
  full_model.npz   — full ViT-B MedSAM forward at real shapes (B=1,
                     1024px padded canvas), f32, scramble quirk = the
                     reference behavior; + encoder embedding (strided).
  full_model_noscramble.npz — SELF-golden: our own f32 CPU forward with
                     compat_scrambled_reshape=False (the from-scratch
                     function has no torch counterpart — this pins it
                     against regressions, it is not reference parity).
  adaptor.npz      — CrossAttentionHfcPatch at real dims (768/1024,
                     grid 64) incl. the scrambled reshape
                     (image_encoder.py:512).
  hfc.npz          — MedSAM.fft band-stop filter (network.py:36-57) at
                     the real 1024 canvas (strided) and a 64px toy
                     (full resolution).
  criterion.npz    — SetCriterion + HungarianMatcher loss dict
                     (build_sam.py:62-210) on three random problems.
  dense_pe.npz     — PositionEmbeddingRandom.get_dense_pe at grid 64,
                     num_pos_feats=128 (pos_encoder.py:36-78), strided.
"""

import json
import sys
import types
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "tests"))
sys.path.insert(0, str(ROOT / "tests" / "oracle"))

from golden_common import golden_value, moments, padded_canvas  # noqa: E402
from reference_loader import REFERENCE, _stub_torchvision  # noqa: E402

GOLDENS = ROOT / "tests" / "goldens"


def seed_module(module, prefix: str):
    """Assign name-deterministic values into every state-dict tensor and
    return the (name, shape, is_buffer) metadata the test side needs."""
    import torch

    buffers = {n for n, _ in module.named_buffers()}
    meta = []
    with torch.no_grad():
        for name, t in module.state_dict().items():
            buf = name in buffers
            full = f"{prefix}.{name}" if prefix else name
            t.copy_(torch.from_numpy(
                golden_value(full, tuple(t.shape), buf)))
            meta.append([full, [int(s) for s in t.shape], buf])
    return meta


def _load_reference():
    _stub_torchvision()
    sys.path.insert(0, str(REFERENCE))
    import importlib
    mods = {n: importlib.import_module(f"segment_anything.{n}")
            for n in ("build_sam", "network")}
    for n in ("image_encoder", "pos_encoder", "matcher"):
        mods[n] = importlib.import_module(
            f"segment_anything.modeling.{n}")
    sys.path.pop(0)
    return mods


def capture_full_model(mods):
    import torch

    args = types.SimpleNamespace(set_cost_class=1, set_cost_bbox=5,
                                 set_cost_giou=2, bbox_loss_coef=5,
                                 giou_loss_coef=2, eos_coef=0.1,
                                 device="cpu")
    sam, _, _ = mods["build_sam"].build_sam_vit_b(checkpoint=None, args=args)
    medsam = mods["network"].MedSAM(sam.image_encoder, sam.mask_decoder,
                                    sam.prompt_encoder)
    medsam.eval()
    meta = seed_module(medsam, "")

    x = padded_canvas(seed=107)  # (1, 1024, 1024, 3), 768 content

    emb_holder = {}
    hook = medsam.image_encoder.register_forward_hook(
        lambda m, i, o: emb_holder.__setitem__("emb", o.detach()))

    class _Nested:
        def __init__(self, t):
            self.tensors = t

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        out = medsam(_Nested(xt), box=np.zeros((1, 4), np.float32))
    hook.remove()
    emb = emb_holder["emb"].numpy()  # (1, 256, 64, 64) NCHW
    np.savez_compressed(
        GOLDENS / "full_model.npz",
        meta=json.dumps(meta),
        logits=out["pred_logits"].numpy(),
        boxes=out["pred_boxes"].numpy(),
        emb_strided=emb[:, :, ::4, ::4],
        emb_moments=moments(emb))
    print("full_model.npz:", out["pred_logits"].shape,
          float(out["pred_logits"].mean()))
    return meta


def capture_self_noscramble(meta):
    """Self-golden for the quirk-fixed adaptor path (no torch oracle
    exists: the scramble IS the reference's behavior)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # never touch the TPU here
    import dataclasses

    import jax.numpy as jnp

    from wildlifemapper_tpu.compat.torch_convert import (map_torch_keys,
                                                         merge_into_params)
    from wildlifemapper_tpu.config import model_config
    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = model_config("vit_b")
    cfg = dataclasses.replace(
        cfg, hfc=dataclasses.replace(cfg.hfc, compat_scrambled_reshape=False))
    model = WildlifeMapper(cfg)
    x = padded_canvas(seed=107)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {name: golden_value(name, shape, buf) for name, shape, buf in meta}
    params, rpt = merge_into_params(params, map_torch_keys(sd, depth=12))
    assert not rpt["missing"], rpt["missing"][:5]
    out = jax.device_get(model.apply(params, jnp.asarray(x)))
    np.savez_compressed(GOLDENS / "full_model_noscramble.npz",
                        meta=json.dumps(meta),
                        logits=out["pred_logits"], boxes=out["pred_boxes"])
    print("full_model_noscramble.npz (self):",
          float(np.mean(out["pred_logits"])))


def capture_adaptor(mods):
    import torch

    ad = mods["image_encoder"].CrossAttentionHfcPatch(
        d_model=768, hfc_dim=1024, nhead=8, dropout=0.1,
        dim_feedforward=1024, activation="relu", proj_dim=1024)
    ad.eval()
    meta = seed_module(ad, "image_encoder.hfc_attn")
    r = np.random.default_rng(211)
    hfc = r.normal(size=(1, 64, 64, 1024)).astype(np.float32)
    patch = r.normal(size=(1, 64, 64, 768)).astype(np.float32)
    with torch.no_grad():
        out = ad(torch.from_numpy(hfc), torch.from_numpy(patch)).numpy()
    np.savez_compressed(GOLDENS / "adaptor.npz", meta=json.dumps(meta),
                        out_strided=out[:, ::4, ::4, :],
                        out_moments=moments(out))
    print("adaptor.npz:", out.shape, float(out.mean()))


def capture_hfc(mods):
    import torch

    fft = mods["network"].MedSAM.fft  # unbound: fft(self, img, rate) ignores self

    class _Nested:  # fft reads img.tensors (network.py:39)
        def __init__(self, t):
            self.tensors = t

    x = padded_canvas(seed=223)
    with torch.no_grad():
        y = fft(None,
                _Nested(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))),
                rate=0.125).numpy()  # (1, 1, 1024, 1024)
    r = np.random.default_rng(227)
    x_toy = r.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        y_toy = fft(None, _Nested(torch.from_numpy(x_toy)),
                    rate=0.125).numpy()
    np.savez_compressed(GOLDENS / "hfc.npz",
                        y_strided=y[:, :, ::8, ::8], y_moments=moments(y),
                        x_toy=x_toy, y_toy=y_toy)
    print("hfc.npz:", y.shape, float(y.mean()))


def capture_criterion(mods):
    import torch

    matcher = mods["matcher"].HungarianMatcher(cost_class=1, cost_bbox=5,
                                               cost_giou=2)
    crit = mods["build_sam"].SetCriterion(
        7, matcher=matcher,
        weight_dict={"loss_ce": 3, "loss_bbox": 5, "loss_giou": 2},
        eos_coef=0.1, losses=["labels", "boxes", "cardinality"])
    out = {}
    for case, counts in enumerate([(3, 7, 0), (5, 12, 2), (40, 60, 51)]):
        rng = np.random.default_rng(300 + case)
        b, q = len(counts), 51
        logits = rng.normal(size=(b, q, 8)).astype(np.float32)
        boxes = rng.uniform(0.2, 0.8, size=(b, q, 4)).astype(np.float32)
        boxes[..., 2:] *= 0.2
        labels = np.zeros((b, 64), np.int64)
        tboxes = np.full((b, 64, 4), 0.5, np.float32)
        targets = []
        for i, n in enumerate(counts):
            lbl = rng.integers(1, 7, size=n)
            bx = np.stack([rng.uniform(0.2, 0.8, n), rng.uniform(0.2, 0.8, n),
                           rng.uniform(0.02, 0.1, n),
                           rng.uniform(0.02, 0.1, n)], -1).astype(np.float32)
            labels[i, :n], tboxes[i, :n] = lbl, bx
            targets.append({"labels": torch.from_numpy(lbl.astype(np.int64)),
                            "boxes": torch.from_numpy(bx)})
        with torch.no_grad():
            ref = crit({"pred_logits": torch.from_numpy(logits),
                        "pred_boxes": torch.from_numpy(boxes)}, targets)
        out[f"c{case}_logits"] = logits
        out[f"c{case}_boxes"] = boxes
        out[f"c{case}_labels"] = labels
        out[f"c{case}_tboxes"] = tboxes
        out[f"c{case}_counts"] = np.asarray(counts)
        for k in ("loss_ce", "loss_bbox", "loss_giou", "cardinality_error",
                  "class_error"):
            out[f"c{case}_{k}"] = np.float64(ref[k])
    np.savez_compressed(GOLDENS / "criterion.npz", **out)
    print("criterion.npz:", {k: float(v) for k, v in out.items()
                             if k.startswith("c0_loss")})


def capture_dense_pe(mods):
    import torch

    pe = mods["pos_encoder"].PositionEmbeddingRandom(num_pos_feats=128)
    meta = seed_module(pe, "prompt_encoder.pe_layer")
    with torch.no_grad():
        y = pe((64, 64)).numpy()  # (256, 64, 64)
    np.savez_compressed(GOLDENS / "dense_pe.npz", meta=json.dumps(meta),
                        y_strided=y[:, ::4, ::4], y_moments=moments(y))
    print("dense_pe.npz:", y.shape, float(y.std()))


def main():
    GOLDENS.mkdir(exist_ok=True)
    mods = _load_reference()
    capture_criterion(mods)
    capture_dense_pe(mods)
    capture_hfc(mods)
    capture_adaptor(mods)
    meta = capture_full_model(mods)
    capture_self_noscramble(meta)
    print("DONE")


if __name__ == "__main__":
    main()
