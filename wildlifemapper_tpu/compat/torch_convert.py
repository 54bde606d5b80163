"""PyTorch checkpoint -> JAX param-tree converter.

Handles both checkpoint flavors the reference uses:

  * Raw SAM weights (`sam_vit_b_01ec64.pth`): keys like
    `image_encoder.blocks.0.attn.qkv.weight`. The reference performs
    "checkpoint surgery" before loading — every `mask_decoder.*` param except
    those containing `transformer` is deleted, then `load_state_dict(
    strict=False)` (build_sam.py:311-322). We reproduce that: mapped keys
    overwrite our init; unmapped/missing keys keep their fresh init.
  * Trained WildlifeMapper checkpoints (`train.py:350-354`): a dict with a
    `model` entry whose keys carry a `module.` DDP prefix and the MedSAM
    wrapper's `image_encoder./mask_decoder./prompt_encoder.` names.

Layout conversions (torch -> flax):
  * Linear: (out, in) -> (in, out) transpose.
  * Conv2d: (out, in, kh, kw) -> (kh, kw, in, out).
  * 1x1 convs used as channel projections (adaptor) -> Dense kernels.
  * nn.MultiheadAttention packed in_proj -> split q/k/v Dense params.
  * NCHW positional embeddings -> NHWC.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Tuple

import numpy as np

from flax import traverse_util


def _t(x):  # torch Linear weight -> flax Dense kernel
    return np.ascontiguousarray(np.asarray(x).T)


def _conv(x):  # torch Conv2d weight -> flax Conv kernel
    return np.ascontiguousarray(np.transpose(np.asarray(x), (2, 3, 1, 0)))


def _conv1x1_to_dense(x):  # (O, I, 1, 1) -> (I, O)
    x = np.asarray(x)
    return np.ascontiguousarray(x[:, :, 0, 0].T)


def _ln(dst_prefix: str, src_prefix: str, sd, out):
    if f"{src_prefix}.weight" in sd:
        out[f"{dst_prefix}/scale"] = np.asarray(sd[f"{src_prefix}.weight"])
    if f"{src_prefix}.bias" in sd:
        out[f"{dst_prefix}/bias"] = np.asarray(sd[f"{src_prefix}.bias"])


def _dense(dst_prefix: str, src_prefix: str, sd, out, conv1x1=False):
    if f"{src_prefix}.weight" in sd:
        w = sd[f"{src_prefix}.weight"]
        out[f"{dst_prefix}/kernel"] = _conv1x1_to_dense(w) if conv1x1 else _t(w)
        if f"{src_prefix}.bias" in sd:
            out[f"{dst_prefix}/bias"] = np.asarray(sd[f"{src_prefix}.bias"])


def _mha(dst_prefix: str, src_prefix: str, sd, out):
    """torch nn.MultiheadAttention -> q/k/v/out Dense params."""
    w_key = f"{src_prefix}.in_proj_weight"
    if w_key not in sd:
        return
    w = np.asarray(sd[w_key])
    b = np.asarray(sd[f"{src_prefix}.in_proj_bias"])
    e = w.shape[1]
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[f"{dst_prefix}/{name}/kernel"] = _t(w[i * e:(i + 1) * e])
        out[f"{dst_prefix}/{name}/bias"] = b[i * e:(i + 1) * e].copy()
    _dense(f"{dst_prefix}/out_proj", f"{src_prefix}.out_proj", sd, out)


def _downsample_attn(dst: str, src: str, sd, out):
    for p in ("q_proj", "k_proj", "v_proj", "out_proj"):
        _dense(f"{dst}/{p}", f"{src}.{p}", sd, out)


def _mlp_head(dst: str, src: str, sd, out, num_layers=3):
    for i in range(num_layers):
        _dense(f"{dst}/layers_{i}", f"{src}.layers.{i}", sd, out)


def map_torch_keys(sd: Mapping[str, Any], depth: int = 12) -> Dict[str, np.ndarray]:
    """Map a (numpy-valued) torch state dict to flat flax param paths."""
    out: Dict[str, np.ndarray] = {}
    enc = "image_encoder"

    # --- image encoder ---------------------------------------------------
    _dense(f"{enc}/patch_embed/proj", "image_encoder.patch_embed.proj", sd, out)
    if "image_encoder.patch_embed.proj.weight" in sd:
        out[f"{enc}/patch_embed/proj/kernel"] = _conv(
            sd["image_encoder.patch_embed.proj.weight"])
    _dense(f"{enc}/hfc_embed/proj", "image_encoder.hfc_embed.proj", sd, out)
    if "image_encoder.hfc_embed.proj.weight" in sd:
        out[f"{enc}/hfc_embed/proj/kernel"] = _conv(
            sd["image_encoder.hfc_embed.proj.weight"])
    if "image_encoder.pos_embed" in sd:
        out[f"{enc}/pos_embed"] = np.asarray(sd["image_encoder.pos_embed"])

    # HFC adaptor
    ad, src = f"{enc}/hfc_attn", "image_encoder.hfc_attn"
    _dense(f"{ad}/proj_hfc", f"{src}.proj_hfc", sd, out, conv1x1=True)
    _dense(f"{ad}/proj_patch", f"{src}.proj_patch", sd, out, conv1x1=True)
    _dense(f"{ad}/proj_back", f"{src}.proj_back", sd, out, conv1x1=True)
    _mha(f"{ad}/cross_attn", f"{src}.cross_attn", sd, out)
    _dense(f"{ad}/linear1", f"{src}.linear1", sd, out)
    _dense(f"{ad}/linear2", f"{src}.linear2", sd, out)
    _ln(f"{ad}/norm1", f"{src}.norm1", sd, out)
    _ln(f"{ad}/norm2", f"{src}.norm2", sd, out)
    if f"{src}.pos_embed" in sd:  # (1, C, 64, 64) -> (1, 64, 64, C)
        out[f"{ad}/pos_embed"] = np.ascontiguousarray(
            np.transpose(np.asarray(sd[f"{src}.pos_embed"]), (0, 2, 3, 1)))

    # ViT blocks
    for i in range(depth):
        d, s = f"{enc}/blocks_{i}", f"image_encoder.blocks.{i}"
        _ln(f"{d}/norm1", f"{s}.norm1", sd, out)
        _ln(f"{d}/norm2", f"{s}.norm2", sd, out)
        _dense(f"{d}/attn/qkv", f"{s}.attn.qkv", sd, out)
        _dense(f"{d}/attn/proj", f"{s}.attn.proj", sd, out)
        for rp in ("rel_pos_h", "rel_pos_w"):
            if f"{s}.attn.{rp}" in sd:
                out[f"{d}/attn/{rp}"] = np.asarray(sd[f"{s}.attn.{rp}"])
        _dense(f"{d}/mlp/lin1", f"{s}.mlp.lin1", sd, out)
        _dense(f"{d}/mlp/lin2", f"{s}.mlp.lin2", sd, out)

    # Neck (Sequential: 0 conv, 1 LN2d, 2 conv, 3 LN2d)
    if "image_encoder.neck.0.weight" in sd:
        out[f"{enc}/neck/conv1/kernel"] = _conv(sd["image_encoder.neck.0.weight"])
        out[f"{enc}/neck/conv2/kernel"] = _conv(sd["image_encoder.neck.2.weight"])
        for j, name in ((1, "ln1"), (3, "ln2")):
            out[f"{enc}/neck/{name}/LayerNorm_0/scale"] = np.asarray(
                sd[f"image_encoder.neck.{j}.weight"])
            out[f"{enc}/neck/{name}/LayerNorm_0/bias"] = np.asarray(
                sd[f"image_encoder.neck.{j}.bias"])

    # --- prompt encoder (dense PE gaussian buffer) -----------------------
    gm = "prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"
    if gm in sd:
        out["pos_encoder/gaussian_matrix"] = np.asarray(sd[gm])

    # --- detection decoder ----------------------------------------------
    dec, msrc = "box_decoder", "mask_decoder"
    if f"{msrc}.mask_tokens.weight" in sd:
        out[f"{dec}/query_tokens"] = np.asarray(sd[f"{msrc}.mask_tokens.weight"])
    for i in range(2):
        d, s = f"{dec}/transformer/layers_{i}", f"{msrc}.transformer.layers.{i}"
        _downsample_attn(f"{d}/self_attn", f"{s}.self_attn", sd, out)
        _downsample_attn(f"{d}/cross_attn_token_to_image",
                         f"{s}.cross_attn_token_to_image", sd, out)
        _downsample_attn(f"{d}/cross_attn_image_to_token",
                         f"{s}.cross_attn_image_to_token", sd, out)
        for n in ("norm1", "norm2", "norm3", "norm4"):
            _ln(f"{d}/{n}", f"{s}.{n}", sd, out)
        _dense(f"{d}/mlp/lin1", f"{s}.mlp.lin1", sd, out)
        _dense(f"{d}/mlp/lin2", f"{s}.mlp.lin2", sd, out)
    _downsample_attn(f"{dec}/transformer/final_attn_token_to_image",
                     f"{msrc}.transformer.final_attn_token_to_image", sd, out)
    _ln(f"{dec}/transformer/norm_final_attn",
        f"{msrc}.transformer.norm_final_attn", sd, out)
    _mlp_head(f"{dec}/class_embed", f"{msrc}.class_embed", sd, out)
    _mlp_head(f"{dec}/bbox_embed", f"{msrc}.bbox_embed", sd, out)

    return out


def strip_prefixes(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Remove DDP 'module.' prefixes (train.py saves the DDP-wrapped model)."""
    return {re.sub(r"^module\.", "", k): v for k, v in sd.items()}


def apply_sam_surgery(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """The reference's decoder-head surgery on raw SAM checkpoints
    (build_sam.py:314-320): keep mask_decoder.* only if 'transformer' in key."""
    return {k: v for k, v in sd.items()
            if not (k.startswith("mask_decoder.") and "transformer" not in k)}


def merge_into_params(params: Dict[str, Any], mapped: Mapping[str, np.ndarray],
                      strict: bool = False) -> Tuple[Dict[str, Any], Dict[str, list]]:
    """Overlay mapped torch weights onto a freshly-initialized flax tree.

    Returns (new_params, report) where report lists 'loaded', 'missing'
    (init kept — strict=False semantics) and 'unexpected' mapped keys.
    """
    flat = dict(traverse_util.flatten_dict(params["params"], sep="/"))
    loaded, unexpected = [], []
    for k, v in mapped.items():
        if k in flat:
            want = tuple(np.asarray(flat[k]).shape)
            if (tuple(v.shape) != want and k.endswith(("rel_pos_h", "rel_pos_w"))
                    and v.ndim == 2 and v.shape[0] > want[0]
                    and v.shape[0] % 2 == 1 and want[0] % 2 == 1
                    and v.shape[1] == want[1]):
                # Smaller target window (e.g. window_size 12 vs SAM's 14):
                # relative distances are a center subset of the table, so a
                # center slice preserves the trained embeddings exactly —
                # the same rule RelPosAttention uses for content crop (NOT
                # the reference's interpolation, which is for resolution
                # changes, image_encoder.py:328-335).
                off = (v.shape[0] - want[0]) // 2
                v = v[off:off + want[0]]
            if tuple(v.shape) != want:
                raise ValueError(
                    f"shape mismatch for {k}: ckpt {v.shape} vs init {want}")
            flat[k] = v.astype(np.asarray(flat[k]).dtype)
            loaded.append(k)
        else:
            unexpected.append(k)
    missing = [k for k in flat if k not in mapped]
    if strict and (missing or unexpected):
        raise ValueError(f"strict load failed: missing={missing} "
                         f"unexpected={unexpected}")
    new = {"params": traverse_util.unflatten_dict(flat, sep="/")}
    return new, {"loaded": loaded, "missing": missing, "unexpected": unexpected}


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file into numpy arrays (requires torch, CPU-only)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and isinstance(obj["model"], dict):
        obj = obj["model"]  # trained WM checkpoint {model, optimizer, epoch}
    return {k: v.detach().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def convert_checkpoint(path: str, params: Dict[str, Any], depth: int = 12,
                       sam_surgery: bool | None = None):
    """Full pipeline: read .pth, strip DDP prefixes, optional SAM surgery
    (auto-detected: applied iff no hfc keys present), map, merge."""
    sd = strip_prefixes(load_torch_file(path))
    if sam_surgery is None:
        sam_surgery = not any("hfc" in k for k in sd)
    if sam_surgery:
        sd = apply_sam_surgery(sd)
    mapped = map_torch_keys(sd, depth=depth)
    return merge_into_params(params, mapped)
