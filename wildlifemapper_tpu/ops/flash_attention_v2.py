"""Packed flash attention for the global ViT blocks: qkv in, heads split
in-kernel.

The v1 flash kernel (ops/flash_attention.py) takes per-(batch*head)
(BH, N, D) operands, so XLA materializes a (3, B*heads, N, 64) transpose of
the qkv GEMM output for each of the 4 global layers (~1.9 ms/layer at
B=16). Here the kernel consumes the GEMM output directly:

    qkv: (B, N, 3C)      —  [q_h0..q_hH | k_h0.. | v_h0..]
    rh:  (B, N, H*gh)    —  rel_h lane-packed per head (static offsets).
    rw:  (B, N, H*gw)    —  rel_w lane-packed per head.
    out: (B, N, C), lse: (B, N, H)

Grid is (B, N/bq); K/V stay VMEM-resident per batch element and each head
computes full-width scores with a single-pass softmax. The decomposed
rel-pos bias is folded into the QK matmul via augmented operands
(see _fwd_kernel) — the kernel has exactly two matmuls and one softmax per
head, and no XLA-side head split exists in the forward pass.

Backward: custom VJP that unpacks to the per-head layout and reuses the v1
flash backward kernel (the transposes return in the bwd pass only — the
inference path never pays them; TODO: packed bwd).

Reference parity: image_encoder.py:207-262 + 347-383 (global attention with
decomposed rel-pos), numerics equal to the jnp oracle.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 512
VMEM_LIMIT = 64 * 1024 * 1024

_NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    if _use_interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _fwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, lse_ref,
                *, scale: float, num_heads: int, grid_hw: Tuple[int, int]):
    """One (batch, q-block) per grid step; packed K/V stay resident in VMEM.

    K/V being fully resident makes flash-style key streaming pointless: the
    (bq, N) score row fits VMEM (<= 4 MB f32 by _block_sizes), so each head
    runs a single-pass softmax over full-width scores. This replaced an
    online-softmax fori_loop over k-tiles — the repeated alpha-rescale
    passes over (bq, bk) f32 tiles were pure VPU overhead (and an earlier
    k-gridded variant with VMEM scratch was 2.2x slower still).

    The decomposed rel-pos bias is *fused into the QK matmul*: with
    q_aug = [q*scale | rel_h | rel_w] and k_aug = [k | E^T | T^T]
    (E[j,r] = [j//gw == r], T[j,c] = [j%gw == c]),
    q_aug @ k_aug^T = scale*qk^T + rel_h-spread + rel_w-spread in one
    K=(d+gh+gw) matmul — no separate bias matmul, repeat, or (bq, n) add
    passes, and K >= 128 uses the MXU contraction lanes better than the
    bare K=d=64 QK pass did."""
    gh, gw = grid_hw
    n = k_ref.shape[1]
    c = q_ref.shape[-1]
    d = c // num_heads
    in_dt = q_ref.dtype

    # transposed expansion matrices (shared across heads)
    jr = jax.lax.broadcasted_iota(jnp.int32, (n, gh), 0)
    re = jax.lax.broadcasted_iota(jnp.int32, (n, gh), 1)
    e_t = (jr // gw == re).astype(in_dt)
    jc = jax.lax.broadcasted_iota(jnp.int32, (n, gw), 0)
    ce = jax.lax.broadcasted_iota(jnp.int32, (n, gw), 1)
    t_t = (jc % gw == ce).astype(in_dt)

    outs, lses = [], []
    for h in range(num_heads):
        q_h = q_ref[0, :, d * h:d * (h + 1)]
        k_h = k_ref[0, :, d * h:d * (h + 1)]
        v_h = v_ref[0, :, d * h:d * (h + 1)]
        rh_h = rh_ref[0, :, gh * h:gh * (h + 1)]
        rw_h = rw_ref[0, :, gw * h:gw * (h + 1)]
        q_aug = jnp.concatenate(
            [(q_h.astype(jnp.float32) * scale).astype(in_dt), rh_h, rw_h],
            axis=-1)
        k_aug = jnp.concatenate([k_h, e_t, t_t], axis=-1)
        s = jax.lax.dot_general(
            q_aug, k_aug, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (bq, n)

        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(
            p.astype(in_dt), v_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        outs.append((acc / l).astype(o_ref.dtype))
        lses.append(m + jnp.log(l))
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=-1)


def pack_rel_global(rel_h, rel_w, num_heads: int, grid_hw: Tuple[int, int]):
    """Per-head (B, H, N, gh/gw) tables -> lane-packed
    (rh (B, N, H*gh), rw (B, N, H*gw)); head h sits in lanes
    [gh*h, gh*(h+1)) — a static lane slice in the kernel."""
    gh, gw = grid_hw
    b, _, n, _ = rel_h.shape
    rh = rel_h.transpose(0, 2, 1, 3).reshape(b, n, num_heads * gh)
    rw = rel_w.transpose(0, 2, 1, 3).reshape(b, n, num_heads * gw)
    return rh, rw


def _block_sizes(n: int, gh: int, gw: int) -> Tuple[int, int]:
    # bq: the largest 128-multiple divisor of n (lane dim of the transposed
    # rel_h block must be 128-aligned) whose full-width f32 score tile
    # (bq, n) stays <= 4 MB — the per-head score/prob buffers are what the
    # Mosaic stack allocator multiplies across the unrolled head loop, and
    # larger tiles blew the scoped-VMEM budget at ViT-B shapes
    # (2304 -> 384, 4096 -> 256).
    budget = 4 * 1024 * 1024
    bq = None
    for cand in range(128, n + 1, 128):
        if n % cand == 0 and cand * n * 4 <= budget:
            bq = cand
    if bq is None:  # tiny/odd n (tests): largest power-of-two divisor
        bq = min(DEFAULT_BQ, n)
        while n % bq:
            bq //= 2
    return bq, gw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_packed(qkv, rhT, rw, scale: float, num_heads: int,
                           grid_hw: Tuple[int, int]):
    """Packed global attention. qkv (B, N, 3C); rhT/rw from
    pack_rel_global. Returns (B, N, C)."""
    return _v2g_fwd(qkv, rhT, rw, scale, num_heads, grid_hw)[0]


def _v2g_fwd(qkv, rh, rw, scale, num_heads, grid_hw):
    gh, gw = grid_hw
    b, n, c3 = qkv.shape
    c = c3 // 3
    bq, _ = _block_sizes(n, gh, gw)
    assert n % gw == 0, (n, gw)

    kernel = functools.partial(_fwd_kernel, scale=scale,
                               num_heads=num_heads, grid_hw=grid_hw)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, n, c), lambda b_, qi: (b_, 0, 1)),   # K resident
            pl.BlockSpec((1, n, c), lambda b_, qi: (b_, 0, 2)),   # V resident
            pl.BlockSpec((1, bq, num_heads * gh),
                         lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, bq, num_heads * gw),
                         lambda b_, qi: (b_, qi, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, bq, num_heads), lambda b_, qi: (b_, qi, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, num_heads), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(qkv, qkv, qkv, rh, rw)  # q/k/v specs slice lane-blocks of one array
    return out, (qkv, rh, rw, out, lse)


def _v2g_fwd_vjp(qkv, rh, rw, scale, num_heads, grid_hw):
    return _v2g_fwd(qkv, rh, rw, scale, num_heads, grid_hw)


def _v2g_bwd(scale, num_heads, grid_hw, res, dout):
    """Unpack to the per-head layout and reuse the v1 flash backward kernel
    (transposes exist here only — the fwd/inference path never pays them)."""
    from .flash_attention import _flash_bwd

    qkv, rh, rw, out, lse = res
    gh, gw = grid_hw
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads

    def split_heads(x):                       # (B, N, C) -> (BH, N, d)
        return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3).reshape(
            b * num_heads, n, d)

    def split_rel(r, width):                  # (B, N, H*w) -> (BH, N, w)
        return r.reshape(b, n, num_heads, width).transpose(0, 2, 1, 3
                                                           ).reshape(
            b * num_heads, n, width)

    q, k, v = (split_heads(qkv[:, :, i * c:(i + 1) * c]) for i in range(3))
    rel_h = split_rel(rh, gh)
    rel_w = split_rel(rw, gw)
    out_h = split_heads(out)
    do_h = split_heads(dout)
    lse_h = lse.transpose(0, 2, 1).reshape(b * num_heads, n, 1)

    v1_res = (q, k, v, rel_h, rel_w, out_h, lse_h,
              rel_h.shape, rel_w.shape)
    dq, dk, dv, drh, drw = _flash_bwd(scale, grid_hw, v1_res, do_h)

    def merge_heads(x):                       # (BH, N, d) -> (B, N, C)
        return x.reshape(b, num_heads, n, d).transpose(0, 2, 1, 3).reshape(
            b, n, c)

    def merge_rel(r, width):
        return r.reshape(b, num_heads, n, width).transpose(0, 2, 1, 3
                                                           ).reshape(
            b, n, num_heads * width)

    dqkv = jnp.concatenate(
        [merge_heads(g.astype(qkv.dtype)) for g in (dq, dk, dv)], axis=-1)
    drh_p = merge_rel(drh.astype(rh.dtype), gh)
    drw_p = merge_rel(drw.astype(rw.dtype), gw)
    return dqkv, drh_p, drw_p


flash_attention_packed.defvjp(_v2g_fwd_vjp, _v2g_bwd)
