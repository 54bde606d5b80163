"""Device mesh + sharding rules.

The reference's only distribution strategy is NCCL data-parallel DDP
(train_utils.py:6-27, train.py:205-207). TPU-natively that becomes a
('data', 'model') mesh:

  * data axis  — batch sharding (DP); gradients are implicitly all-reduced
    by XLA when the loss averages over the sharded batch dim (the DDP
    bucket all-reduce equivalent rides the ICI).
  * model axis — optional tensor parallelism for ViT-H-scale encoders:
    attention qkv/proj and MLP kernels are sharded over heads/hidden dims.

Rules are path-pattern based over the flax param tree, so they apply to any
variant (B/L/H) without per-model annotations.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import jax
import numpy as np
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (regex over 'a/b/c' param path, PartitionSpec) — first match wins.
# Kernel layouts are flax: Dense (in, out), Conv (kh, kw, in, out).
TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn/qkv/kernel$", P(None, "model")),
    (r".*attn/qkv/bias$", P("model")),
    (r".*attn/proj/kernel$", P("model", None)),
    (r".*mlp/lin1/kernel$", P(None, "model")),
    (r".*mlp/lin1/bias$", P("model")),
    (r".*mlp/lin2/kernel$", P("model", None)),
    (r".*(linear1|q_proj|k_proj|v_proj)/kernel$", P(None, "model")),
    (r".*(linear1|q_proj|k_proj|v_proj)/bias$", P("model")),
    (r".*(linear2|out_proj)/kernel$", P("model", None)),
)


def make_mesh(model_parallel: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def param_pspec(params: Dict[str, Any], use_tp: bool = True) -> Dict[str, Any]:
    """PartitionSpec pytree for a param tree (replicated unless a TP rule
    matches and use_tp)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    out = {}
    for path, v in flat.items():
        spec = P()
        if use_tp:
            for pat, s in TP_RULES:
                if re.match(pat, path):
                    # only shard dims that divide evenly; else replicate
                    spec = s
                    break
        out[path] = spec
    return traverse_util.unflatten_dict(out, sep="/")


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, spec):
        if axis is None:
            continue
        if dim % mesh.shape[axis] != 0:
            return False
    return True


def shard_params(params, mesh: Mesh, use_tp: bool = True):
    """NamedSharding pytree; falls back to replication for non-divisible dims."""
    specs = param_pspec(params, use_tp=use_tp and mesh.shape.get("model", 1) > 1)
    flat_p = traverse_util.flatten_dict(params, sep="/")
    flat_s = traverse_util.flatten_dict(specs, sep="/")
    out = {}
    for k, spec in flat_s.items():
        if not _divisible(np.shape(flat_p[k]), spec, mesh):
            spec = P()
        out[k] = NamedSharding(mesh, spec)
    return traverse_util.unflatten_dict(out, sep="/")


def shard_opt_state(opt_state, params, mesh: Mesh, use_tp: bool = True):
    """NamedSharding pytree for an optax state whose moment trees mirror the
    param tree (AdamW mu/nu). Each state leaf whose trailing dict path + shape
    matches a param inherits that param's sharding; everything else (counts,
    MaskedNodes, schedules) is replicated. Keeps TP runs from replicating 2x
    param-size moments on every chip (the ViT-H case TP exists for)."""
    param_shard = traverse_util.flatten_dict(
        shard_params(params, mesh, use_tp=use_tp), sep="/")
    param_shape = {k: np.shape(v) for k, v in
                   traverse_util.flatten_dict(params, sep="/").items()}
    rep = NamedSharding(mesh, P())

    def assign(path, leaf):
        keys = [p.key for p in path if isinstance(p, jax.tree_util.DictKey)]
        for i in range(len(keys)):
            cand = "/".join(keys[i:])
            if cand in param_shard and param_shape[cand] == np.shape(leaf):
                return param_shard[cand]
        return rep

    return jax.tree_util.tree_map_with_path(assign, opt_state)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
