"""Packed flash attention for the global ViT blocks: qkv in, heads split
in-kernel.

The v1 flash kernel (ops/flash_attention.py) takes per-(batch*head)
(BH, N, D) operands, so XLA materializes a (3, B*heads, N, 64) transpose of
the qkv GEMM output for each of the 4 global layers (~1.9 ms/layer at
B=16). Here the kernel consumes the GEMM output directly:

    qkv: (B, N, 3C)      —  [q_h0..q_hH | k_h0.. | v_h0..]
    rhT: (B, H*GH, N)    —  rel_h transposed; head h in sublane rows
                            [GH*h, GH*h+gh) so the per-k-tile row slice is
                            a dynamic *sublane* slice (8-granular), which
                            lane slices cannot be.
    rw:  (B, N, H*gw)    —  rel_w lane-packed per head (static offsets).
    out: (B, N, C), lse: (B, N, H)

Grid is (B, N/bq, N/bk) with the key dimension innermost; the online
softmax state (m, l, acc for all heads) lives in VMEM scratch that persists
across the k-steps of one (b, q-block). Per k-step the kernel loops the
heads, slicing 64-wide q/k/v lanes in VMEM — no XLA-side head split exists
in the forward pass.

The decomposed rel-pos bias per (head, k-tile) uses the same recipe as v1
(flash_attention.py:62-85): the kh part contracts rows = bk/gw (<= 8) via a
tiny expansion matmul, the kw part tiles with pltpu.repeat.

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
DEFAULT_BK = 512
VMEM_LIMIT = 48 * 1024 * 1024

_NEG_INF = -1e30


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params():
    if _use_interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _fwd_kernel(q_ref, k_ref, v_ref, rhT_ref, rw_ref, o_ref, lse_ref,
                *, scale: float, num_heads: int, grid_hw: Tuple[int, int],
                bk: int):
    """One (batch, q-block) per grid step; packed K/V stay resident in VMEM
    and the key dimension runs as an in-kernel fori_loop per head with the
    online-softmax state in registers. (A first cut gridded the key dim and
    carried m/l/acc in VMEM scratch — the per-head scratch read-modify-write
    serialized the MXU and ran 2.2x slower than this form.)"""
    gh, gw = grid_hw
    gh_pad = _pad8(gh)
    n = k_ref.shape[1]
    c = q_ref.shape[-1]
    d = c // num_heads
    bq = q_ref.shape[1]
    rows = bk // gw
    in_dt = q_ref.dtype

    # local expansion matrix: e[r, j] = [j // gw == r] for one k tile's rows
    je = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
    re = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0)
    e_small = (je // gw == re).astype(jnp.float32)

    outs, lses = [], []
    for h in range(num_heads):
        q_h = q_ref[0, :, d * h:d * (h + 1)]
        rw_h = rw_ref[0, :, gw * h:gw * (h + 1)].astype(jnp.float32)

        def body(i, carry, h=h, q_h=q_h, rw_h=rw_h):
            m, l, acc = carry
            k0 = i * bk
            k_blk = k_ref[0, pl.ds(k0, bk), d * h:d * (h + 1)]
            v_blk = v_ref[0, pl.ds(k0, bk), d * h:d * (h + 1)]
            s = jax.lax.dot_general(
                q_h, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale      # (bq, bk)
            r0 = pl.multiple_of(gh_pad * h + i * rows, rows)
            rh_slice = rhT_ref[0, pl.ds(r0, rows), :].astype(jnp.float32)
            s = s + jax.lax.dot_general(
                rh_slice, e_small, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            s = s + pltpu.repeat(rw_h, rows, axis=1)

            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * alpha + jnp.dot(
                p.astype(in_dt), v_blk, preferred_element_type=jnp.float32)
            return m_new, l, acc

        m0 = jnp.full((bq, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq, 1), jnp.float32)
        a0 = jnp.zeros((bq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n // bk, body, (m0, l0, a0))
        outs.append((acc / l).astype(o_ref.dtype))
        lses.append(m + jnp.log(l))
    o_ref[0] = jnp.concatenate(outs, axis=-1)
    lse_ref[0] = jnp.concatenate(lses, axis=-1)


def pack_rel_global(rel_h, rel_w, num_heads: int, grid_hw: Tuple[int, int]):
    """Per-head (B, H, N, gh/gw) tables -> (rhT (B, H*GH, N), rw (B, N, H*gw))."""
    gh, gw = grid_hw
    b, _, n, _ = rel_h.shape
    gh_pad = _pad8(gh)
    rhT = jnp.pad(rel_h, ((0, 0), (0, 0), (0, 0), (0, gh_pad - gh)))
    rhT = rhT.transpose(0, 1, 3, 2).reshape(b, num_heads * gh_pad, n)
    rw = rel_w.transpose(0, 2, 1, 3).reshape(b, n, num_heads * gw)
    return rhT, rw


def _block_sizes(n: int, gh: int, gw: int) -> Tuple[int, int]:
    # bq: the largest 64-aligned divisor of n up to 1.25*DEFAULT_BQ. Plain
    # halving collapses to 256 on the 48-grid (2304 tokens) and halves MXU
    # efficiency; 2304 -> 576, 4096 -> 512.
    # bq is also the lane dim of the transposed rel_h block, so it must be a
    # multiple of 128. Plain halving collapses to 256 on the 48-grid (2304
    # tokens) and halves MXU efficiency; 2304 -> 768, 4096 -> 512.
    bq = None
    for cand in range(128, int(DEFAULT_BQ * 1.5) + 1, 128):
        if n % cand == 0:
            bq = cand
    if bq is None:  # tiny/odd n (tests): largest power-of-two divisor
        bq = min(DEFAULT_BQ, n)
        while n % bq:
            bq //= 2
    # Each k-tile must cover whole grid rows (bk = rows*gw) so the per-tile
    # rel_h sublane slice + expansion matmul line up: rows is the largest
    # divisor of gh with rows*gw <= 1.5*DEFAULT_BK and rows a multiple of 8
    # (sublane-granular rhT slices). 64-grid -> 8*64=512, 48-grid -> 16*48=768.
    step = 8 if gh % 8 == 0 else 1
    best = step
    for cand in range(step, gh + 1, step):
        if gh % cand == 0 and cand * gw <= int(DEFAULT_BK * 1.5):
            best = cand
    return bq, best * gw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention_packed(qkv, rhT, rw, scale: float, num_heads: int,
                           grid_hw: Tuple[int, int]):
    """Packed global attention. qkv (B, N, 3C); rhT/rw from
    pack_rel_global. Returns (B, N, C)."""
    return _v2g_fwd(qkv, rhT, rw, scale, num_heads, grid_hw)[0]


def _v2g_fwd(qkv, rhT, rw, scale, num_heads, grid_hw):
    gh, gw = grid_hw
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    gh_pad = _pad8(gh)
    bq, bk = _block_sizes(n, gh, gw)
    assert bk % gw == 0 and n % bk == 0, (bk, gw, n)

    kernel = functools.partial(_fwd_kernel, scale=scale,
                               num_heads=num_heads, grid_hw=grid_hw, bk=bk)
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda b_, qi: (b_, qi, 0)),
            pl.BlockSpec((1, n, c), lambda b_, qi: (b_, 0, 1)),   # K resident
            pl.BlockSpec((1, n, c), lambda b_, qi: (b_, 0, 2)),   # V resident
            pl.BlockSpec((1, num_heads * gh_pad, bq),
                         lambda b_, qi: (b_, 0, qi)),
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
    )(qkv, qkv, qkv, rhT, rw)  # q/k/v specs slice lane-blocks of one array
    return out, (qkv, rhT, rw, out, lse)


def _v2g_fwd_vjp(qkv, rhT, rw, scale, num_heads, grid_hw):
    return _v2g_fwd(qkv, rhT, rw, scale, num_heads, grid_hw)


def _v2g_bwd(scale, num_heads, grid_hw, res, dout):
    """Unpack to the per-head layout and reuse the v1 flash backward kernel
    (transposes exist here only — the fwd/inference path never pays them)."""
    from .flash_attention import _flash_bwd

    qkv, rhT, rw, out, lse = res
    gh, gw = grid_hw
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    gh_pad = _pad8(gh)

    def split_heads(x):                       # (B, N, C) -> (BH, N, d)
        return x.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3).reshape(
            b * num_heads, n, d)

    q, k, v = (split_heads(qkv[:, :, i * c:(i + 1) * c]) for i in range(3))
    rel_h = rhT.reshape(b, num_heads, gh_pad, n)[:, :, :gh]
    rel_h = rel_h.transpose(0, 1, 3, 2).reshape(b * num_heads, n, gh)
    rel_w = rw.reshape(b, n, num_heads, gw).transpose(0, 2, 1, 3).reshape(
        b * num_heads, n, gw)
    out_h = split_heads(out)
    do_h = split_heads(dout)
    lse_h = lse.transpose(0, 2, 1).reshape(b * num_heads, n, 1)

    v1_res = (q, k, v, rel_h, rel_w, out_h, lse_h,
              rel_h.shape, rel_w.shape)
    dq, dk, dv, drh, drw = _flash_bwd(scale, grid_hw, v1_res, do_h)

    def merge_heads(x):                       # (BH, N, d) -> (B, N, C)
        return x.reshape(b, num_heads, n, d).transpose(0, 2, 1, 3).reshape(
            b, n, c)

    dqkv = jnp.concatenate(
        [merge_heads(g.astype(qkv.dtype)) for g in (dq, dk, dv)], axis=-1)
    drh = drh.reshape(b, num_heads, n, gh)
    drhT = jnp.pad(drh, ((0, 0), (0, 0), (0, 0), (0, gh_pad - gh)))
    drhT = drhT.transpose(0, 1, 3, 2).reshape(
        b, num_heads * gh_pad, n).astype(rhT.dtype)
    drw = drw.reshape(b, num_heads, n, gw).transpose(0, 2, 1, 3).reshape(
        b, n, num_heads * gw).astype(rw.dtype)
    return dqkv, drhT, drw


flash_attention_packed.defvjp(_v2g_fwd_vjp, _v2g_bwd)
