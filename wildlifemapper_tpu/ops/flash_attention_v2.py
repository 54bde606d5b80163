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

Backward: packed two-kernel split in the same layouts (no head transposes
in either direction): one kernel grids q-blocks and emits dq/drh/drw, the
other grids k-blocks and emits dk/dv; both recompute scores with the same
fused-bias matmul and reuse the forward lse (no max pass). delta =
rowsum(do * o) per head is precomputed once in XLA.

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
# Mosaic scoped-VMEM budget. 64 MB (the Mosaic default) rejects the
# full-canvas n=4096 program: the fwd f32 instance needs 81.3 MB and the
# bf16 bwd 90.9 MB (compiler-reported), which used to surface as an opaque
# tpu_compile_helper crash for ViT-B B<8 training and ViT-L/H flash+remat.
# v5e has 128 MB VMEM/core; 110 MB compiles and runs all tiers (measured:
# ViT-B B=4 full-canvas bf16 train 223.5 ms/step). Smaller programs are
# unaffected — this is a ceiling, not an allocation.
VMEM_LIMIT = 110 * 1024 * 1024
# f32 score-tile caps for the q-block-size choice (fwd: _block_sizes,
# bwd: _v2g_bwd). Module-level so hardware sweeps can retune them under
# the raised VMEM ceiling (4 MB -> bq=256 at n=4096; larger tiles mean
# fatter MXU row blocks for the augmented QK matmul).
FWD_TILE_BUDGET = 4 * 1024 * 1024
BWD_TILE_BUDGET = 2 * 1024 * 1024
# Serving-only experiment knob (sweep_train_kernels / trace_tiers measure
# it): run the forward softmax's exp in bf16 instead of f32. The prob tile
# is cast to bf16 for the PV matmul regardless, so only the normalizer's
# accuracy drops (rel ~1e-3); the softmax is the kernel's VPU bound
# (~2.9 of 4.45 ms per crop-tier call). Measured on-chip (round 4,
# scripts/sweep_serving_softmax.py): 0.866x — SLOWER than f32 (the bf16
# exp forces extra convert traffic) and class-prob drift 2.06e-3 exceeds
# the 1.5e-3 bf16-tier tolerance of record. Permanently OFF; kept only so
# the sweep script documents the negative result. Forward only: the
# backward always recomputes p in f32 from the saved lse.
FAST_SOFTMAX_EXP = False


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    if _use_interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _exp_mats_t(rows: int, gh: int, gw: int, dtype, k0=0):
    """Transposed expansion matrices for keys [k0, k0+rows):
    e_t[j, r] = [(k0+j)//gw == r] (rows, gh), t_t[j, c] = [(k0+j)%gw == c]
    (rows, gw). Appended to k so the rel-pos bias rides the QK matmul."""
    jr = jax.lax.broadcasted_iota(jnp.int32, (rows, gh), 0) + k0
    re = jax.lax.broadcasted_iota(jnp.int32, (rows, gh), 1)
    e_t = (jr // gw == re).astype(dtype)
    jc = jax.lax.broadcasted_iota(jnp.int32, (rows, gw), 0) + k0
    ce = jax.lax.broadcasted_iota(jnp.int32, (rows, gw), 1)
    t_t = (jc % gw == ce).astype(dtype)
    return e_t, t_t


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

    e_t, t_t = _exp_mats_t(n, gh, gw, in_dt)

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
        if FAST_SOFTMAX_EXP:
            p = jnp.exp((s - m).astype(jnp.bfloat16))
            l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
        else:
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
    # (bq, n) stays <= FWD_TILE_BUDGET — the per-head score/prob buffers
    # are what the Mosaic stack allocator multiplies across the unrolled
    # head loop; larger tiles blew the old 64 MB scoped-VMEM budget at
    # ViT-B shapes (2304 -> 384, 4096 -> 256).
    budget = FWD_TILE_BUDGET
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


def _bwd_dq_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, lse_ref, delta_ref,
                   do_ref, dq_ref, drh_ref, drw_ref,
                   *, scale: float, num_heads: int,
                   grid_hw: Tuple[int, int]):
    """dq/drh/drw for one (batch, q-block): recompute scores with the same
    fused-bias matmul as the forward, p from the saved lse (no max pass)."""
    gh, gw = grid_hw
    n = k_ref.shape[1]
    c = do_ref.shape[-1]
    d = c // num_heads
    in_dt = q_ref.dtype
    e_t, t_t = _exp_mats_t(n, gh, gw, in_dt)

    dqs, drhs, drws = [], [], []
    for h in range(num_heads):
        q_h = q_ref[0, :, d * h:d * (h + 1)]
        k_h = k_ref[0, :, d * h:d * (h + 1)]
        v_h = v_ref[0, :, d * h:d * (h + 1)]
        rh_h = rh_ref[0, :, gh * h:gh * (h + 1)]
        rw_h = rw_ref[0, :, gw * h:gw * (h + 1)]
        do_h = do_ref[0, :, d * h:d * (h + 1)]
        q_aug = jnp.concatenate(
            [(q_h.astype(jnp.float32) * scale).astype(in_dt), rh_h, rw_h],
            axis=-1)
        k_aug = jnp.concatenate([k_h, e_t, t_t], axis=-1)
        s = jax.lax.dot_general(
            q_aug, k_aug, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (bq, n)
        p = jnp.exp(s - lse_ref[0, :, h:h + 1])
        dp = jax.lax.dot_general(
            do_h, v_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (bq, n)
        ds = (p * (dp - delta_ref[0, :, h:h + 1])).astype(in_dt)
        dqs.append((jax.lax.dot_general(
            ds, k_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype))
        drhs.append(jax.lax.dot_general(
            ds, e_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(drh_ref.dtype))
        drws.append(jax.lax.dot_general(
            ds, t_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(drw_ref.dtype))
    dq_ref[0] = jnp.concatenate(dqs, axis=-1)
    drh_ref[0] = jnp.concatenate(drhs, axis=-1)
    drw_ref[0] = jnp.concatenate(drws, axis=-1)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, lse_t_ref,
                    delta_t_ref, do_ref, dk_ref, dv_ref,
                    *, scale: float, num_heads: int,
                    grid_hw: Tuple[int, int], bk: int):
    """dk/dv for one (batch, k-block): transposed scores against the full
    resident q_aug; no cross-step accumulation exists by construction.
    lse/delta arrive pre-transposed as (B, H, N) so the per-head slice is a
    (1, n) row vector — a sublane slice, not a lane gather."""
    gh, gw = grid_hw
    n = q_ref.shape[1]
    c = do_ref.shape[-1]
    d = c // num_heads
    in_dt = q_ref.dtype
    k0 = pl.program_id(1) * bk
    e_t, t_t = _exp_mats_t(bk, gh, gw, in_dt, k0=k0)

    dks, dvs = [], []
    for h in range(num_heads):
        q_h = q_ref[0, :, d * h:d * (h + 1)]
        k_h = k_ref[0, :, d * h:d * (h + 1)]
        v_h = v_ref[0, :, d * h:d * (h + 1)]
        rh_h = rh_ref[0, :, gh * h:gh * (h + 1)]
        rw_h = rw_ref[0, :, gw * h:gw * (h + 1)]
        do_h = do_ref[0, :, d * h:d * (h + 1)]
        q_aug = jnp.concatenate(
            [(q_h.astype(jnp.float32) * scale).astype(in_dt), rh_h, rw_h],
            axis=-1)                                             # (n, aug)
        k_aug = jnp.concatenate([k_h, e_t, t_t], axis=-1)        # (bk, aug)
        s_t = jax.lax.dot_general(
            k_aug, q_aug, (((1,), (1,)), ((), ())),
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


def _v2g_bwd(scale, num_heads, grid_hw, res, dout):
    """Packed backward: no XLA-side head split/merge in either direction."""
    qkv, rh, rw, out, lse = res
    gh, gw = grid_hw
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    hs_h, hs_w = num_heads * gh, num_heads * gw
    # Backward holds more residents (do + lse/delta + two output blocks),
    # so halve the score-tile budget relative to the forward: 64.71M > 64M
    # at bq=384/B=8 was the measured overflow (historical, at the old 64 MB
    # VMEM_LIMIT; BWD_TILE_BUDGET is module-level so sweeps can retune it).
    bq, _ = _block_sizes(n, gh, gw)
    if bq > 128 and n * bq * 4 > BWD_TILE_BUDGET:
        bq = max(128, bq // 2)
        while n % bq:
            bq //= 2

    # delta[b, q, h] = sum_d do_h * o_h — one cheap XLA pass, shared by
    # both kernels (saves them carrying `out` in VMEM).
    delta = jnp.sum(dout.reshape(b, n, num_heads, d).astype(jnp.float32)
                    * out.reshape(b, n, num_heads, d).astype(jnp.float32),
                    axis=-1)                                     # (B, N, H)

    common_in = [
        pl.BlockSpec((1, n, c), lambda b_, i: (b_, 0, 0)),       # q resident
        pl.BlockSpec((1, n, c), lambda b_, i: (b_, 0, 1)),       # k resident
        pl.BlockSpec((1, n, c), lambda b_, i: (b_, 0, 2)),       # v resident
        pl.BlockSpec((1, n, hs_h), lambda b_, i: (b_, 0, 0)),
        pl.BlockSpec((1, n, hs_w), lambda b_, i: (b_, 0, 0)),
        pl.BlockSpec((1, n, num_heads), lambda b_, i: (b_, 0, 0)),
        pl.BlockSpec((1, n, num_heads), lambda b_, i: (b_, 0, 0)),
        pl.BlockSpec((1, n, c), lambda b_, i: (b_, 0, 0)),       # do resident
    ]

    dq_in = list(common_in)
    dq_in[0] = pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0))
    dq_in[3] = pl.BlockSpec((1, bq, hs_h), lambda b_, i: (b_, i, 0))
    dq_in[4] = pl.BlockSpec((1, bq, hs_w), lambda b_, i: (b_, i, 0))
    dq_in[5] = pl.BlockSpec((1, bq, num_heads), lambda b_, i: (b_, i, 0))
    dq_in[6] = pl.BlockSpec((1, bq, num_heads), lambda b_, i: (b_, i, 0))
    dq_in[7] = pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0))
    dq, drh, drw = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, num_heads=num_heads,
                          grid_hw=grid_hw),
        grid=(b, n // bq),
        in_specs=dq_in,
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, bq, hs_h), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, bq, hs_w), lambda b_, i: (b_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, hs_h), rh.dtype),
            jax.ShapeDtypeStruct((b, n, hs_w), rw.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(qkv, qkv, qkv, rh, rw, lse, delta, dout)

    dkv_in = list(common_in)
    dkv_in[1] = pl.BlockSpec((1, bq, c),
                             lambda b_, i: (b_, i, 1))           # k block
    dkv_in[2] = pl.BlockSpec((1, bq, c),
                             lambda b_, i: (b_, i, 2))           # v block
    dkv_in[5] = pl.BlockSpec((1, num_heads, n), lambda b_, i: (b_, 0, 0))
    dkv_in[6] = pl.BlockSpec((1, num_heads, n), lambda b_, i: (b_, 0, 0))
    lse_t = lse.transpose(0, 2, 1)                               # (B, H, N)
    delta_t = delta.transpose(0, 2, 1)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, num_heads=num_heads,
                          grid_hw=grid_hw, bk=bq),
        grid=(b, n // bq),
        in_specs=dkv_in,
        out_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0)),
            pl.BlockSpec((1, bq, c), lambda b_, i: (b_, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(qkv, qkv, qkv, rh, rw, lse_t, delta_t, dout)

    dqkv = jnp.concatenate([dq, dk, dv], axis=-1)
    return dqkv, drh, drw


flash_attention_packed.defvjp(_v2g_fwd_vjp, _v2g_bwd)
