"""Pallas flash attention with decomposed relative-position bias.

The key custom kernel (SURVEY §7 hard part #1). The reference materializes
the full (B*heads, N, N) attention matrix plus a broadcast
(B*heads, qh, qw, kh, kw) rel-pos bias (image_encoder.py:246-262, 347-383) —
at N=4096/f32 that is ~6 GB per global layer per 8-image batch, which both
overflows HBM and saturates bandwidth. Here attention runs tile-by-tile with
the online-softmax recurrence, and the decomposed bias

    bias[q, kh*W + kw] = rel_h[q, kh] + rel_w[q, kw]

is regenerated per (BQ, BK) tile from the two small projections
rel_h/rel_w (each (N, W), W = grid width) via two tiny MXU matmuls against
0/1 expansion matrices:

    E[r, j] = [ (k0 + j) // W == r ]   (row selector)
    T[r, j] = [ j % W == r ]           (column tiler)
    bias_tile = rel_h_blk @ E + rel_w_blk @ T

which avoids in-kernel gathers/reshapes entirely. K/V/rel tables for one
(batch*head) fit comfortably in VMEM at N=4096, D=64, so the kernel needs no
manual DMA pipelining — the grid is (BH, N/BQ) and Mosaic streams blocks.

A custom VJP implements the matching flash backward (dq, dk, dv, drel_h,
drel_w, with drel tiles reduced through E^T / T^T), so the 4 global
attention layers train without ever materializing N^2 state.

On non-TPU backends the kernel runs in interpreter mode (tests) — the public
entry point dispatches automatically.
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
# Backward holds q/o/do/dq blocks + full K/V/dK/dV (each double-buffered by
# the pipeline) in VMEM; 512-wide blocks overflow the 16MB scoped limit.
DEFAULT_BQ_BWD = 256

_NEG_INF = -1e30


def _expansion_mats(h: int, w: int, bk: int, k0, dtype):
    """E (h, bk): row selector for kh; T (w, bk): tiler for kw."""
    jh = jax.lax.broadcasted_iota(jnp.int32, (h, bk), 1)
    rh = jax.lax.broadcasted_iota(jnp.int32, (h, bk), 0)
    e = ((k0 + jh) // w == rh).astype(dtype)
    jw = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 1)
    rw = jax.lax.broadcasted_iota(jnp.int32, (w, bk), 0)
    t = (jw % w == rw).astype(dtype)
    return e, t


def _bias_tile(rhT_ref, rw, k0, bk: int, w: int):
    """(bq, bk) f32 bias tile for keys [k0, k0+bk).

    bias[q, j] = rh[q, (k0+j)//w] + rw[q, (k0+j)%w]. The naive E/T expansion
    matmuls cost two extra QK^T-sized MXU passes (K = w ~ head_dim), doubling
    kernel FLOPs; instead the kw part tiles rw with pltpu.repeat (pure VPU
    copy) and the kh part contracts only over `rows` = bk/w (<= 8) — ~6% of
    the QK cost. rel_h arrives *transposed* as (h, bq) so the per-tile row
    slice hits the 8-granular sublane dim (lane-dim dynamic slices must be
    128-aligned on TPU). Requires k0 % w == 0 and bk % w == 0 (true for
    power-of-two blocks over the 64-wide grid).
    """
    rows = bk // w
    r0 = pl.multiple_of(k0 // w, rows)
    rh_slice = rhT_ref[pl.ds(r0, rows), :].astype(jnp.float32)  # (rows, bq)
    # element-repeat each row-value w times: tiny K=rows matmul
    j = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0)
    e_small = (j // w == r).astype(jnp.float32)
    rh_rep = jax.lax.dot_general(
        rh_slice, e_small, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                     # (bq, bk)
    rw_tile = pltpu.repeat(rw.astype(jnp.float32), rows, axis=1)  # tile
    return rh_rep + rw_tile


def _fwd_kernel(q_ref, k_ref, v_ref, rhT_ref, rw_ref, o_ref, l_ref, m_ref,
                *, scale: float, bk: int, h: int, w: int):
    n, d = k_ref.shape
    bq = q_ref.shape[0]
    # MXU inputs stay in the storage dtype (bf16 on the fast path) with f32
    # accumulation; only softmax state is f32. rel_h arrives transposed
    # (h, bq) — see _bias_tile.
    q = q_ref[:]
    in_dt = q.dtype
    rw = rw_ref[:].astype(in_dt)           # (bq, w)

    m = jnp.full((bq, 1), _NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k0 = i * bk
        k_blk = k_ref[pl.ds(k0, bk), :]
        v_blk = v_ref[pl.ds(k0, bk), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bk % w == 0:
            s = s + _bias_tile(rhT_ref, rw, k0, bk, w)
        else:  # irregular grids (tests): expansion-matmul fallback
            e, t = _expansion_mats(h, w, bk, k0, in_dt)
            rh = rhT_ref[:].astype(in_dt).swapaxes(0, 1)   # (bq, h)
            s = s + jnp.dot(rh, e, preferred_element_type=jnp.float32)
            s = s + jnp.dot(rw, t, preferred_element_type=jnp.float32)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p.astype(in_dt), v_blk,
                                    preferred_element_type=jnp.float32)
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, n // bk, body, (m, l, acc))
    o_ref[:] = (acc / l).astype(o_ref.dtype)
    l_ref[:] = l
    m_ref[:] = m


def _bwd_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, do_ref,
                lse_ref, dq_ref, dk_ref, dv_ref, drh_ref, drw_ref,
                *, scale: float, bk: int, h: int, w: int):
    """Backward for one (bh, q-block): recompute p tile-by-tile, accumulate
    dq/drh/drw locally and dk/dv into (shared-output) accumulators."""
    n, d = k_ref.shape
    bq = q_ref.shape[0]
    q = q_ref[:]
    in_dt = q.dtype
    do = do_ref[:].astype(in_dt)
    o = o_ref[:].astype(jnp.float32)
    lse = lse_ref[:]                         # (bq, 1) logsumexp
    rh = rh_ref[:].astype(in_dt)
    rw = rw_ref[:].astype(in_dt)
    delta = jnp.sum(do.astype(jnp.float32) * o, axis=-1, keepdims=True)

    # first q-block of this bh zeroes the K/V accumulators
    @pl.when(pl.program_id(1) == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    dq = jnp.zeros((bq, d), jnp.float32)
    drh = jnp.zeros((bq, h), jnp.float32)
    drw = jnp.zeros((bq, w), jnp.float32)

    def body(i, carry):
        dq, drh, drw = carry
        k0 = i * bk
        k_blk = k_ref[pl.ds(k0, bk), :]
        v_blk = v_ref[pl.ds(k0, bk), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        e, t = _expansion_mats(h, w, bk, k0, in_dt)
        s = s + jnp.dot(rh, e, preferred_element_type=jnp.float32)
        s = s + jnp.dot(rw, t, preferred_element_type=jnp.float32)
        p = jnp.exp(s - lse)                                   # (bq, bk)
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - delta)).astype(in_dt)                  # (bq, bk)
        p_lo = p.astype(in_dt)

        dq = dq + jnp.dot(ds, k_blk,
                          preferred_element_type=jnp.float32) * scale
        drh = drh + jnp.dot(ds, e.T, preferred_element_type=jnp.float32)
        drw = drw + jnp.dot(ds, t.T, preferred_element_type=jnp.float32)
        dk_ref[pl.ds(k0, bk), :] += jnp.dot(
            ds.T, q, preferred_element_type=jnp.float32) * scale
        dv_ref[pl.ds(k0, bk), :] += jnp.dot(
            p_lo.T, do, preferred_element_type=jnp.float32)
        return dq, drh, drw

    dq, drh, drw = jax.lax.fori_loop(0, n // bk, body, (dq, drh, drw))
    dq_ref[:] = dq.astype(dq_ref.dtype)
    drh_ref[:] = drh.astype(drh_ref.dtype)
    drw_ref[:] = drw.astype(drw_ref.dtype)


def _block_sizes(n: int, bq0: int = DEFAULT_BQ,
                 bk0: int = DEFAULT_BK) -> Tuple[int, int]:
    bq = min(bq0, n)
    bk = min(bk0, n)
    while n % bq:
        bq //= 2
    while n % bk:
        bk //= 2
    return bq, bk


def _use_interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_rel_pos(q, k, v, rel_h, rel_w, scale: float,
                            grid_hw: Tuple[int, int]):
    """q, k, v: (BH, N, D); rel_h, rel_w: (BH, qh, qw, W) or (BH, N, W);
    scale: softmax scale; grid_hw: (h, w) token grid with h*w == N.

    Returns (BH, N, D) in q's dtype.
    """
    out, _ = _flash_fwd(q, k, v, rel_h, rel_w, scale, grid_hw)
    return out


def _flash_fwd(q, k, v, rel_h, rel_w, scale, grid_hw):
    h, w = grid_hw
    bh, n, d = q.shape
    assert h * w == n, (h, w, n)
    rel_h_shape, rel_w_shape = rel_h.shape, rel_w.shape
    rel_h = rel_h.reshape(bh, n, h)
    rel_w = rel_w.reshape(bh, n, w)
    rel_h_t = rel_h.swapaxes(1, 2)  # (bh, h, n): sublane-sliceable in-kernel
    bq, bk = _block_sizes(n)

    grid = (bh, n // bq)
    kernel = functools.partial(_fwd_kernel, scale=scale, bk=bk, h=h, w=w)
    out, l, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, h, bq), lambda b, i: (b, 0, i)),
            pl.BlockSpec((None, bq, w), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, 1), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, 1), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(q, k, v, rel_h_t, rel_w)
    lse = m + jnp.log(l)
    return out, (q, k, v, rel_h, rel_w, out, lse, rel_h_shape, rel_w_shape)


def _flash_fwd_vjp(q, k, v, rel_h, rel_w, scale, grid_hw):
    out, res = _flash_fwd(q, k, v, rel_h, rel_w, scale, grid_hw)
    return out, res


def _flash_bwd(scale, grid_hw, res, g):
    q, k, v, rel_h, rel_w, out, lse, rel_h_shape, rel_w_shape = res
    h, w = grid_hw
    bh, n, d = q.shape
    bq, bk = _block_sizes(n, DEFAULT_BQ_BWD, DEFAULT_BQ_BWD)
    grid = (bh, n // bq)
    kernel = functools.partial(_bwd_kernel, scale=scale, bk=bk, h=h, w=w)
    dq, dk, dv, drh, drw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, bq, h), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, w), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0)),  # out
            pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0)),  # dout
            pl.BlockSpec((None, bq, 1), lambda b, i: (b, i, 0)),  # lse
        ],
        out_specs=[
            pl.BlockSpec((None, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, n, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, bq, h), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, bq, w), lambda b, i: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, h), jnp.float32),
            jax.ShapeDtypeStruct((bh, n, w), jnp.float32),
        ],
        interpret=_use_interpret(),
    )(q, k, v, rel_h, rel_w, out, g, lse)
    # cotangents must match the primal (possibly 4D) rel shapes
    return (dq, dk.astype(k.dtype), dv.astype(v.dtype),
            drh.astype(rel_h.dtype).reshape(rel_h_shape),
            drw.astype(rel_w.dtype).reshape(rel_w_shape))


flash_attention_rel_pos.defvjp(_flash_fwd_vjp, _flash_bwd)


def reference_attention_rel_pos(q, k, v, rel_h, rel_w, scale, grid_hw):
    """jnp oracle (materializes N^2) for kernel tests."""
    h, w = grid_hw
    bh, n, d = q.shape
    s = jnp.einsum("bqc,bkc->bqk", q * scale, k).astype(jnp.float32)
    s = s.reshape(bh, n, h, w)
    s = s + rel_h.reshape(bh, n, h)[..., :, None]
    s = s + rel_w.reshape(bh, n, w)[..., None, :]
    s = s.reshape(bh, n, n)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkc->bqc", p.astype(q.dtype), v)
