"""Packed cross-attention for the HFC adaptor: full-row softmax, K/V
VMEM-resident, heads split in-kernel.

The adaptor's MultiheadAttention (models/adaptor.py; reference parity
CrossAttentionHfcPatch, image_encoder.py:452-516) previously routed through
the v1 flash kernel with a zero rel-pos bias: per-(batch*head) operands
(XLA materializes head transposes of all three projections) and an
online-softmax k-loop whose alpha-rescale passes are pure VPU overhead when
K/V fit in VMEM — the same inefficiency the packed global kernel removed
(ops/flash_attention_v2.py). Measured 12.3 ms/step at B=16 (~89 TF/s).

This kernel consumes the q/k/v projection GEMM outputs directly:

    q: (B, N, C)  —  [q_h0 | q_h1 | ...] (a Dense output is already
    k: (B, M, C)      head-packed: reshape(B, N, H, hd) slices C lanes
    v: (B, M, C)      contiguously)
    out: (B, N, C), lse: (B, N, H)

Grid is (B, N/bq); K/V stay VMEM-resident per batch element and each head
computes full-width (bq, M) scores once with a single-pass softmax. Unlike
the v1 path this supports nq != nk and needs no square-grid bias hack.

Backward mirrors flash_attention_v2's packed two-kernel split minus the
rel-pos terms: one kernel grids q-blocks and emits dq, the other grids
k-blocks and emits dk/dv; both recompute scores and reuse the forward lse.
delta = rowsum(do * o) per head is precomputed once in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .flash_attention_v2 import _compiler_params, _use_interpret


def _block(rows: int, width: int) -> int:
    """Largest 128-multiple divisor of `rows` whose (rows_block, width) f32
    score tile stays <= 4 MB (the per-head buffers are multiplied across
    the unrolled head loop by the Mosaic stack allocator)."""
    budget = 4 * 1024 * 1024
    best = None
    for cand in range(128, rows + 1, 128):
        if rows % cand == 0 and cand * width * 4 <= budget:
            best = cand
    if best is None:  # tiny/odd shapes, or huge `width` (large M)
        best = min(512, rows)
        while rows % best:
            best //= 2
        # Still honor the budget: without this, a (512, M) f32 score tile
        # can exceed the scoped-VMEM limit for very wide M and fail to
        # compile. Re-descend to a divisor after each halving (halving an
        # odd divisor breaks divisibility).
        while best > 1 and best * width * 4 > budget:
            best //= 2
            while best > 1 and rows % best:
                best //= 2
    return best


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref,
                *, scale: float, num_heads: int):
    c = q_ref.shape[-1]
    d = c // num_heads
    in_dt = q_ref.dtype
    outs, lses = [], []
    for h in range(num_heads):
        q_h = q_ref[0, :, d * h:d * (h + 1)]
        k_h = k_ref[0, :, d * h:d * (h + 1)]
        v_h = v_ref[0, :, d * h:d * (h + 1)]
        s = jax.lax.dot_general(
            (q_h.astype(jnp.float32) * scale).astype(in_dt), k_h,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (bq, m)
        m_ = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m_)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(in_dt), v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((acc / l).astype(o_ref.dtype))
        lses.append(m_ + jnp.log(l))
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=-1)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, lse_ref, delta_ref, do_ref, dq_ref,
                   *, scale: float, num_heads: int):
    c = q_ref.shape[-1]
    d = c // num_heads
    in_dt = q_ref.dtype
    dqs = []
    for h in range(num_heads):
        q_h = q_ref[0, :, d * h:d * (h + 1)]
        k_h = k_ref[0, :, d * h:d * (h + 1)]
        v_h = v_ref[0, :, d * h:d * (h + 1)]
        do_h = do_ref[0, :, d * h:d * (h + 1)]
        s = jax.lax.dot_general(
            (q_h.astype(jnp.float32) * scale).astype(in_dt), k_h,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (bq, m)
        p = jnp.exp(s - lse_ref[0, :, h:h + 1])
        dp = jax.lax.dot_general(
            do_h, v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta_ref[0, :, h:h + 1])).astype(in_dt)
        dqs.append((jax.lax.dot_general(
            ds, k_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, lse_t_ref, delta_t_ref, do_ref,
                    dk_ref, dv_ref, *, scale: float, num_heads: int):
    """dk/dv for one (batch, k-block) against the full resident q/do;
    lse/delta arrive pre-transposed as (B, H, N) so the per-head slice is
    a (1, n) row vector."""
    c = q_ref.shape[-1]
    d = c // num_heads
    in_dt = q_ref.dtype
    dks, dvs = [], []
    for h in range(num_heads):
        q_h = q_ref[0, :, d * h:d * (h + 1)]
        k_h = k_ref[0, :, d * h:d * (h + 1)]
        v_h = v_ref[0, :, d * h:d * (h + 1)]
        do_h = do_ref[0, :, d * h:d * (h + 1)]
        s_t = jax.lax.dot_general(
            k_h, (q_h.astype(jnp.float32) * scale).astype(in_dt),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (bk, n)
        p_t = jnp.exp(s_t - lse_t_ref[0, h:h + 1, :])
        dp_t = jax.lax.dot_general(
            v_h, do_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (bk, n)
        ds_t = (p_t * (dp_t - delta_t_ref[0, h:h + 1, :])).astype(in_dt)
        dks.append((jax.lax.dot_general(
            ds_t, q_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype))
        dvs.append(jax.lax.dot_general(
            p_t.astype(in_dt), do_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype))
    dk_ref[0] = jnp.concatenate(dks, axis=-1)
    dv_ref[0] = jnp.concatenate(dvs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def cross_attention_packed(q, k, v, scale: float, num_heads: int):
    """Cross attention. q (B, N, C) head-packed; k/v (B, M, C).
    Returns (B, N, C)."""
    return _fwd(q, k, v, scale, num_heads)[0]


def _fwd(q, k, v, scale, num_heads):
    b, n, c = q.shape
    m = k.shape[1]
    bq = _block(n, m)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=num_heads),
        grid=(b, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, m, c), lambda b_, qi: (b_, 0, 0)),  # K resident
            pl.BlockSpec((1, m, c), lambda b_, qi: (b_, 0, 0)),  # V resident
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, bq, num_heads), lambda b_, qi: (b_, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), q.dtype),
            jax.ShapeDtypeStruct((b, n, num_heads), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(q, k, v)
    return out, (q, k, v, out, lse)


def _fwd_vjp(q, k, v, scale, num_heads):
    return _fwd(q, k, v, scale, num_heads)


def _bwd(scale, num_heads, res, dout):
    q, k, v, out, lse = res
    b, n, c = q.shape
    m = k.shape[1]
    d = c // num_heads
    # Backward holds more residents (do + lse/delta + output blocks), so
    # halve the score-tile budget like flash_attention_v2._v2g_bwd does.
    bq = _block(n, m)
    if bq > 128 and m * bq * 4 > 2 * 1024 * 1024:
        bq = max(128, bq // 2)
        while n % bq:
            bq //= 2
    bk = _block(m, n)
    if bk > 128 and n * bk * 4 > 2 * 1024 * 1024:
        bk = max(128, bk // 2)
        while m % bk:
            bk //= 2

    delta = jnp.sum(dout.reshape(b, n, num_heads, d).astype(jnp.float32)
                    * out.reshape(b, n, num_heads, d).astype(jnp.float32),
                    axis=-1)                                     # (B, N, H)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, num_heads=num_heads),
        grid=(b, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, m, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, m, c), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, bq, num_heads), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, bq, num_heads), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), q.dtype),
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(q, k, v, lse, delta, dout)

    lse_t = lse.transpose(0, 2, 1)                               # (B, H, N)
    delta_t = delta.transpose(0, 2, 1)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale,
                          num_heads=num_heads),
        grid=(b, m // bk),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda b_, i: (b_, 0, 0)),   # q resident
            pl.BlockSpec((1, bk, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, bk, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, num_heads, n), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, num_heads, n), lambda b_, i: (b_, 0, 0)),
            pl.BlockSpec((1, n, c), lambda b_, i: (b_, 0, 0)),   # do resident
        ],
        out_specs=[
            pl.BlockSpec((1, bk, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, bk, c), lambda b_, i: (b_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, m, c), k.dtype),
            jax.ShapeDtypeStruct((b, m, c), v.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(q, k, v, lse_t, delta_t, dout)
    return dq, dk, dv


cross_attention_packed.defvjp(_fwd_vjp, _bwd)
