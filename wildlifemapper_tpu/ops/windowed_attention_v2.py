"""Fused windowed attention v2: packed-qkv in, packed-out, heads split
in-kernel.

The v1 kernel (ops/windowed_attention.py) consumes per-window-head
(BWH, N, D) operands, which forces XLA to materialize a 5-D
(3, B*W, heads, N, D) transpose of the qkv projection (~1.9 ms per layer at
B=16) plus matching output reshapes — the round-1 trace attributes ~140 ms
of a 373 ms step to this class of layout churn. This kernel instead
consumes the qkv Dense output *exactly as the GEMM produces it*:

    qkv:   (BW, N, 3*C)   —  [q_h0..q_hH | k_h0..k_hH | v_h0..v_hH]
    rel_h: (BW, N, H*SH)  —  head h in lanes [SH*h, SH*h + kh), SH = 16
    rel_w: (BW, N, H*SH)
    out:   (BW, N, C)

Heads are separated inside VMEM with static 64-wide lane slices (cheap VPU
shifts; the only HBM traffic left is the block DMA Mosaic performs anyway),
and the decomposed rel-pos bias is expanded per head with the same K=kh /
K=kw expansion matmuls as v1 (cost ~ kh/64 of a QK pass each). Rel tables
pack per-head lanes at stride SH=16 so each head's slice is a small static
lane offset.

Reference parity target: image_encoder.py:188-204 (windowed attention) +
:347-383 (decomposed rel-pos); numerics near-identical to v1 / the jnp
oracle within bf16 rounding — the fused-bias formulation rounds q*scale
back to bf16 before the QK matmul where v1 scaled the f32 accumulator, so
bf16 outputs are not bit-identical (oracle tests are tolerance-based).

Backward: custom VJP recomputing scores per head in one kernel that emits
packed dqkv plus packed drel tables, so the training step sees the same
packed layouts in both directions.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 4        # windows per grid step (fwd); each holds all heads
GROUP_BWD = 2
# Mosaic's default 16MB scoped-VMEM limit rejects GROUP=4 at ViT-B shapes
# (20.5MB with double-buffered blocks); v5e's physical VMEM comfortably
# allows more (round-1 sweeps ran at 64MB).
VMEM_LIMIT = 48 * 1024 * 1024

SUBLANE_H = 16   # per-head lane stride in the packed rel tables


def _compiler_params():
    if _use_interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot(a, b, dims, out_dtype=jnp.float32):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((0,), (0,))),
                               preferred_element_type=out_dtype)


def _expansion_mats(h: int, w: int, dtype):
    """Transposed expansion matrices keyed by key index: e_t (h*w, h) with
    e_t[kn, r] = [kn//w == r], t_t (h*w, w) with t_t[kn, c] = [kn%w == c].
    Appended to k so the decomposed rel-pos bias rides the QK matmul
    (same augmented-operand trick as flash_attention_v2): one K=(d+gh+gw)
    matmul replaces QK + two K=gh/gw expansion matmuls (11% MXU lane use
    at gh=14) + two full (G, N, N) f32 add passes."""
    n = h * w
    jr = jax.lax.broadcasted_iota(jnp.int32, (n, h), 0)
    re = jax.lax.broadcasted_iota(jnp.int32, (n, h), 1)
    e_t = (jr // w == re).astype(dtype)
    jc = jax.lax.broadcasted_iota(jnp.int32, (n, w), 0)
    ce = jax.lax.broadcasted_iota(jnp.int32, (n, w), 1)
    t_t = (jc % w == ce).astype(dtype)
    return e_t, t_t


def _head_scores(qkv, rel_h, rel_w, e_t, t_t, h_idx, *, c, d, scale):
    """(G, N, N) f32 scores for one head via the fused-bias matmul."""
    gh, gw = e_t.shape[1], t_t.shape[1]
    g = qkv.shape[0]
    in_dt = qkv.dtype
    q = qkv[:, :, d * h_idx:d * (h_idx + 1)]
    k = qkv[:, :, c + d * h_idx:c + d * (h_idx + 1)]
    rh = rel_h[:, :, SUBLANE_H * h_idx:SUBLANE_H * h_idx + gh]
    rw = rel_w[:, :, SUBLANE_H * h_idx:SUBLANE_H * h_idx + gw]
    q_aug = jnp.concatenate(
        [(q.astype(jnp.float32) * scale).astype(in_dt),
         rh.astype(in_dt), rw.astype(in_dt)], axis=-1)       # (G, N, aug)
    k_aug = jnp.concatenate(
        [k, jnp.broadcast_to(e_t.astype(in_dt)[None], (g,) + e_t.shape),
         jnp.broadcast_to(t_t.astype(in_dt)[None], (g,) + t_t.shape)],
        axis=-1)                                             # (G, N, aug)
    return _dot(q_aug, k_aug, ((2,), (2,)))                  # (G, N, N) f32


def _fwd_kernel(qkv_ref, relh_ref, relw_ref, o_ref, *, scale: float,
                num_heads: int, grid_hw: Tuple[int, int]):
    gh, gw = grid_hw
    qkv = qkv_ref[:]                                        # (G, N, 3C)
    rel_h = relh_ref[:]
    rel_w = relw_ref[:]
    c = qkv.shape[-1] // 3
    d = c // num_heads
    e, t = _expansion_mats(gh, gw, rel_h.dtype)

    outs = []
    for h_idx in range(num_heads):
        s = _head_scores(qkv, rel_h, rel_w, e, t, h_idx, c=c, d=d,
                         scale=scale)
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        v = qkv[:, :, 2 * c + d * h_idx:2 * c + d * (h_idx + 1)]
        outs.append(_dot(p, v, ((2,), (1,))).astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)


def _bwd_kernel(qkv_ref, relh_ref, relw_ref, do_ref,
                dqkv_ref, drelh_ref, drelw_ref, *, scale: float,
                num_heads: int, grid_hw: Tuple[int, int]):
    gh, gw = grid_hw
    qkv = qkv_ref[:]
    rel_h = relh_ref[:]
    rel_w = relw_ref[:]
    do = do_ref[:]                                          # (G, N, C)
    c = qkv.shape[-1] // 3
    d = c // num_heads
    e, t = _expansion_mats(gh, gw, rel_h.dtype)
    in_dt = qkv.dtype

    dqs, dks, dvs, drhs, drws = [], [], [], [], []
    for h_idx in range(num_heads):
        q = qkv[:, :, d * h_idx:d * (h_idx + 1)]
        k = qkv[:, :, c + d * h_idx:c + d * (h_idx + 1)]
        v = qkv[:, :, 2 * c + d * h_idx:2 * c + d * (h_idx + 1)]
        do_h = do[:, :, d * h_idx:d * (h_idx + 1)]

        s = _head_scores(qkv, rel_h, rel_w, e, t, h_idx, c=c, d=d,
                         scale=scale)
        p = jax.nn.softmax(s, axis=-1)                      # (G, N, N) f32

        dp = _dot(do_h, v, ((2,), (2,)))                    # (G, N, N)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        ds_lo = ds.astype(in_dt)
        p_lo = p.astype(in_dt)

        dqs.append((_dot(ds_lo, k, ((2,), (1,))) * scale).astype(in_dt))
        dks.append((jnp.einsum("gnk,gnd->gkd", ds_lo, q,
                               preferred_element_type=jnp.float32)
                    * scale).astype(in_dt))
        dvs.append(jnp.einsum("gnk,gnd->gkd", p_lo, do_h,
                              preferred_element_type=jnp.float32
                              ).astype(in_dt))
        # drel (packed layout): drel_h[g, q, r] = sum_k ds[g, q, k] e_t[k, r]
        drh = jnp.einsum("gnk,kh->gnh", ds_lo, e.astype(in_dt),
                         preferred_element_type=jnp.float32)
        drw = jnp.einsum("gnk,kw->gnw", ds_lo, t.astype(in_dt),
                         preferred_element_type=jnp.float32)
        drhs.append(jnp.pad(drh, ((0, 0), (0, 0), (0, SUBLANE_H - gh))))
        drws.append(jnp.pad(drw, ((0, 0), (0, 0), (0, SUBLANE_H - gw))))

    dqkv_ref[:] = jnp.concatenate(dqs + dks + dvs, axis=-1)
    drelh_ref[:] = jnp.concatenate(drhs, axis=-1).astype(drelh_ref.dtype)
    drelw_ref[:] = jnp.concatenate(drws, axis=-1).astype(drelw_ref.dtype)


def _pad_group(x, g):
    n = x.shape[0]
    pad = (-n) % g
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def pack_rel_tables(rel_h, rel_w, num_heads: int,
                    grid_hw: Tuple[int, int]):
    """(B, heads, N, kh/kw) per-head tables -> packed (B*heads merged into
    lanes) (B, N, heads*SUBLANE_H) pair expected by the kernel."""
    gh, gw = grid_hw
    b = rel_h.shape[0]
    n = rel_h.shape[2]

    def pack(r, width):
        r = jnp.pad(r, ((0, 0), (0, 0), (0, 0), (0, SUBLANE_H - width)))
        # (B, H, N, SH) -> (B, N, H*SH)
        return r.transpose(0, 2, 1, 3).reshape(b, n, num_heads * SUBLANE_H)

    return pack(rel_h, gh), pack(rel_w, gw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def windowed_attention_packed(qkv, rel_h, rel_w, scale: float,
                              num_heads: int, grid_hw: Tuple[int, int]):
    """Packed multi-head windowed attention.

    Args:
      qkv: (BW, N, 3*C) — the qkv Dense output, untouched.
      rel_h: (BW, N, num_heads*SUBLANE_H) — head h in lanes [16h, 16h+gh).
      rel_w: same with gw.
      scale: softmax scale.
      num_heads: head count (C = qkv.shape[-1] // 3 must divide).
      grid_hw: (gh, gw) window grid with gh*gw == N.

    Returns: (BW, N, C) in qkv's dtype.
    """
    return _v2_fwd(qkv, rel_h, rel_w, scale, num_heads, grid_hw)[0]


def _v2_fwd(qkv, rel_h, rel_w, scale, num_heads, grid_hw):
    bw, n, c3 = qkv.shape
    c = c3 // 3
    g = min(GROUP, bw)
    qkv_p = _pad_group(qkv, g)
    rh_p = _pad_group(rel_h, g)
    rw_p = _pad_group(rel_w, g)
    total = qkv_p.shape[0]
    hs = num_heads * SUBLANE_H

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=num_heads,
                          grid_hw=grid_hw),
        grid=(total // g,),
        in_specs=[
            pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, hs), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((total, n, c), qkv.dtype),
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(qkv_p, rh_p, rw_p)[:bw]
    return out, (qkv, rel_h, rel_w)


def _v2_fwd_vjp(qkv, rel_h, rel_w, scale, num_heads, grid_hw):
    return _v2_fwd(qkv, rel_h, rel_w, scale, num_heads, grid_hw)


def _v2_bwd(scale, num_heads, grid_hw, res, dout):
    qkv, rel_h, rel_w = res
    bw, n, c3 = qkv.shape
    c = c3 // 3
    g = min(GROUP_BWD, bw)
    qkv_p = _pad_group(qkv, g)
    rh_p = _pad_group(rel_h, g)
    rw_p = _pad_group(rel_w, g)
    do_p = _pad_group(dout, g)
    total = qkv_p.shape[0]
    hs = num_heads * SUBLANE_H

    dqkv, drh, drw = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, num_heads=num_heads,
                          grid_hw=grid_hw),
        grid=(total // g,),
        in_specs=[
            pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, c), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((g, n, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, hs), lambda i: (i, 0, 0)),
            pl.BlockSpec((g, n, hs), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((total, n, c3), qkv.dtype),
            jax.ShapeDtypeStruct((total, n, hs), rel_h.dtype),
            jax.ShapeDtypeStruct((total, n, hs), rel_w.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(qkv_p, rh_p, rw_p, do_p)
    return dqkv[:bw], drh[:bw], drw[:bw]


windowed_attention_packed.defvjp(_v2_fwd_vjp, _v2_bwd)
