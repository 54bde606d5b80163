"""Pallas kernel for windowed (local) attention with decomposed rel-pos.

The windowed ViT blocks attend within 14x14=196-token windows. The XLA path
materializes (B*25*heads, 196, 196) f32 score matrices in HBM — ~2 GB of
traffic per layer per 8-image batch, making 8 of 12 encoder layers
bandwidth-bound. This kernel processes a group of window-heads per grid
step entirely in VMEM: batched QK^T, bias via the same E/T expansion
matmuls as the global flash kernel (ops/flash_attention.py), plain softmax
(196 keys need no online recurrence), and PV — scores never touch HBM.

Forward-only custom_vjp: the backward recomputes scores and uses standard
attention gradients, also batched in-kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

GROUP = 16      # window-heads per grid step (forward)
GROUP_BWD = 8   # backward holds ~2x the intermediates; 16 overflows VMEM


@functools.lru_cache(maxsize=16)
def _exp_mats(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    j = np.arange(h * w)
    e = (j[None, :] // w == np.arange(h)[:, None]).astype(np.float32)
    t = (j[None, :] % w == np.arange(w)[:, None]).astype(np.float32)
    return e, t


def _batched_dot(a, b, dims, out_dtype=jnp.float32):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((0,), (0,))),
                               preferred_element_type=out_dtype)


def _bias_full(rh, rw, e, t):
    """(G, N, N) bias via the two K=h/K=w expansion matmuls (h, w <= 14 —
    ~20% of the QK cost; a pltpu.repeat variant materialized more VMEM and
    benched slower)."""
    return (jnp.einsum("gnh,hk->gnk", rh, e,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("gnw,wk->gnk", rw, t,
                         preferred_element_type=jnp.float32))


def _fwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, e_ref, t_ref, o_ref,
                *, scale: float):
    q, k, v = q_ref[:], k_ref[:], v_ref[:]          # (G, N, D)
    rh, rw = rh_ref[:], rw_ref[:]                   # (G, N, h/w)
    e, t = e_ref[:], t_ref[:]                       # (h, N), (w, N)

    s = _batched_dot(q, k, ((2,), (2,))) * scale    # (G, N, N) f32
    s = s + _bias_full(rh, rw, e, t)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o_ref[:] = _batched_dot(p, v, ((2,), (1,))).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, e_ref, t_ref, do_ref,
                dq_ref, dk_ref, dv_ref, drh_ref, drw_ref, *, scale: float):
    q, k, v = q_ref[:], k_ref[:], v_ref[:]
    rh, rw = rh_ref[:], rw_ref[:]
    e, t = e_ref[:], t_ref[:]
    do = do_ref[:]

    s = _batched_dot(q, k, ((2,), (2,))) * scale
    bias = (jnp.einsum("gnh,hk->gnk", rh, e, preferred_element_type=jnp.float32)
            + jnp.einsum("gnw,wk->gnk", rw, t,
                         preferred_element_type=jnp.float32))
    p = jax.nn.softmax(s + bias, axis=-1)           # (G, N, N) f32

    dp = _batched_dot(do, v, ((2,), (2,)))          # (G, N, N)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta)                           # f32
    ds_lo = ds.astype(q.dtype)

    dq_ref[:] = (_batched_dot(ds_lo, k, ((2,), (1,))) * scale
                 ).astype(dq_ref.dtype)
    dk_ref[:] = (jnp.einsum("gnk,gnd->gkd", ds_lo, q,
                            preferred_element_type=jnp.float32) * scale
                 ).astype(dk_ref.dtype)
    dv_ref[:] = jnp.einsum("gnk,gnd->gkd", p.astype(q.dtype), do,
                           preferred_element_type=jnp.float32
                           ).astype(dv_ref.dtype)
    drh_ref[:] = jnp.einsum("gnk,hk->gnh", ds_lo, e,
                            preferred_element_type=jnp.float32
                            ).astype(drh_ref.dtype)
    drw_ref[:] = jnp.einsum("gnk,wk->gnw", ds_lo, t,
                            preferred_element_type=jnp.float32
                            ).astype(drw_ref.dtype)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_group(x, g):
    n = x.shape[0]
    pad = (-n) % g
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def windowed_attention_rel_pos(q, k, v, rel_h, rel_w, scale: float,
                               grid_hw: Tuple[int, int]):
    """q/k/v: (BWH, N, D) per window-head; rel_h: (BWH, N, h),
    rel_w: (BWH, N, w) with h*w == N. Returns (BWH, N, D)."""
    return _wfwd(q, k, v, rel_h, rel_w, scale, grid_hw)[0]


def _specs(g, n, d, h, w):
    in_specs = [
        pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, n, h), lambda i: (i, 0, 0)),
        pl.BlockSpec((g, n, w), lambda i: (i, 0, 0)),
        pl.BlockSpec((h, n), lambda i: (0, 0)),
        pl.BlockSpec((w, n), lambda i: (0, 0)),
    ]
    return in_specs


def _wfwd(q, k, v, rel_h, rel_w, scale, grid_hw):
    h, w = grid_hw
    bwh, n, d = q.shape
    assert h * w == n
    g = min(GROUP, bwh)
    (qp, _), (kp, _), (vp, _) = (_pad_group(x, g) for x in (q, k, v))
    rhp, _ = _pad_group(rel_h, g)
    rwp, _ = _pad_group(rel_w, g)
    e, t = _exp_mats(h, w)
    e = jnp.asarray(e, q.dtype)
    t = jnp.asarray(t, q.dtype)
    total = qp.shape[0]

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(total // g,),
        in_specs=_specs(g, n, d, h, w),
        out_specs=pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((total, n, d), q.dtype),
        interpret=_use_interpret(),
    )(qp, kp, vp, rhp, rwp, e, t)[:bwh]
    return out, (q, k, v, rel_h, rel_w)


def _wfwd_vjp(q, k, v, rel_h, rel_w, scale, grid_hw):
    return _wfwd(q, k, v, rel_h, rel_w, scale, grid_hw)


def _wbwd(scale, grid_hw, res, dout):
    q, k, v, rel_h, rel_w = res
    h, w = grid_hw
    bwh, n, d = q.shape
    g = min(GROUP_BWD, bwh)
    (qp, _), (kp, _), (vp, _) = (_pad_group(x, g) for x in (q, k, v))
    rhp, _ = _pad_group(rel_h, g)
    rwp, _ = _pad_group(rel_w, g)
    dop, _ = _pad_group(dout, g)
    e, t = _exp_mats(h, w)
    e = jnp.asarray(e, q.dtype)
    t = jnp.asarray(t, q.dtype)
    total = qp.shape[0]

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(total // g,),
        in_specs=_specs(g, n, d, h, w) + [
            pl.BlockSpec((g, n, d), lambda i: (i, 0, 0))],
        out_specs=[
            pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, h), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, w), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((total, n, d), q.dtype),
            jax.ShapeDtypeStruct((total, n, d), k.dtype),
            jax.ShapeDtypeStruct((total, n, d), v.dtype),
            jax.ShapeDtypeStruct((total, n, h), rel_h.dtype),
            jax.ShapeDtypeStruct((total, n, w), rel_w.dtype),
        ],
        interpret=_use_interpret(),
    )(qp, kp, vp, rhp, rwp, e, t, dop)
    dq, dk, dv, drh, drw = (o[:bwh] for o in outs)
    return dq, dk, dv, drh, drw


windowed_attention_rel_pos.defvjp(_wfwd_vjp, _wbwd)
