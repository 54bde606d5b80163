"""Fused transformer MLP: fc1 -> erf-GELU -> fc2 in one Pallas kernel.

The per-block MLP (models/common.py MLPBlock; reference common.py:13-28)
is the largest GEMM family in every serving tier: 12 x ~2.97 ms/step at
B=16 in the crop tier (~60% MXU) with the (R, 3072) hidden tensor making a
full HBM round trip between fc1 and fc2 (227 MB each way at B=16). Both
weight matrices fit VMEM together (768x3072 bf16 x 2 = 9.4 MB), so this
kernel tiles rows, keeps weights resident, and the hidden activations
never leave VMEM:

    x:  (R, D)   w1: (D, F)   b1: (F,)   w2: (F, D)   b2: (D,)
    out = gelu_erf(x @ w1 + b1) @ w2 + b2      (R, D)

GELU is the exact erf form (torch parity; the tanh approximation diverges
by ~1e-4). Accumulation and the activation run in f32 regardless of the
input dtype, matching the XLA path's preferred_element_type behavior.

Backward is a plain-jnp recompute (standard dense gradients) — the
training path pays one extra fc1 GEMM, which remat policies pay anyway;
the kernel's win is the serving tiers.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention_v2 import _use_interpret

BM = 512  # row tile
VMEM_LIMIT = 64 * 1024 * 1024


def _compiler_params():
    if _use_interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT)


# Pallas TPU has no erf lowering (NotImplementedError at compile), so the
# kernel carries XLA's own f32 rational approximation (ErfImpl32: clamp to
# [-4, 4], degree-6/4 polynomials in x^2, Horner order preserved) —
# max |diff| vs lax.erf measured 4.8e-7, vs true erf 1.7e-7.
_ERF_ALPHA = (-2.72614225801306e-10, 2.77068142495902e-08,
              -2.10102402082508e-06, -5.69250639462346e-05,
              -7.34990630326855e-04, -2.95459980854025e-03,
              -1.60960333262415e-02)
_ERF_BETA = (-1.45660718464996e-05, -2.13374055278905e-04,
             -1.68282697438203e-03, -7.37332916720468e-03,
             -1.42647390514189e-02)


def _erf_f32(x):
    x = jnp.clip(x, -4.0, 4.0)
    z = x * x
    p = jnp.float32(_ERF_ALPHA[0])
    for c in _ERF_ALPHA[1:]:
        p = p * z + jnp.float32(c)
    q = jnp.float32(_ERF_BETA[0])
    for c in _ERF_BETA[1:]:
        q = q * z + jnp.float32(c)
    return x * p / q


def _erf_gelu_f32(h):
    return 0.5 * h * (1.0 + _erf_f32(h * (2.0 ** -0.5)))


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]  # (bm,F)+(1,F)
    a = _erf_gelu_f32(h).astype(x_ref.dtype)
    y = jax.lax.dot_general(
        a, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


def _rows_block(r: int) -> int:
    best = None
    for cand in range(128, min(r, BM) + 1, 128):
        if r % cand == 0:
            best = cand
    if best is None:
        best = min(BM, r)
        while r % best:
            best //= 2
    return best


@jax.custom_vjp
def fused_mlp(x, w1, b1, w2, b2):
    """x (R, D) -> (R, D) through fc1/erf-gelu/fc2. Biases are (F,)/(D,);
    they ride as (1, F)/(1, D) blocks (TPU Pallas wants >=2-D refs)."""
    r, d = x.shape
    f = w1.shape[1]
    bm = _rows_block(r)
    return pl.pallas_call(
        _kernel,
        grid=(r // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),     # resident
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, d), lambda i: (0, 0)),     # resident
            pl.BlockSpec((1, d), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((r, d), x.dtype),
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(x, w1, b1.reshape(1, f), w2, b2.reshape(1, d))


def _bwd_dh_kernel(x_ref, w1_ref, b1_ref, da_ref, a_ref, dh_ref):
    """Recompute h = x@w1+b1 in VMEM and emit a = gelu(h) plus
    dh = da * gelu'(h) — the only elementwise stage of the backward, fused
    with the recompute GEMM so h never exists in HBM. gelu'(h) =
    0.5*(1+erf(h/sqrt2)) + h*pdf(h)."""
    h = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]
    cdf = 0.5 * (1.0 + _erf_f32(h * (2.0 ** -0.5)))
    a_ref[...] = (h * cdf).astype(a_ref.dtype)
    pdf = jnp.exp(-0.5 * h * h) * jnp.float32(1.0 / np.sqrt(2.0 * np.pi))
    dh_ref[...] = (da_ref[...].astype(jnp.float32)
                   * (cdf + h * pdf)).astype(dh_ref.dtype)


def _mlp_fwd(x, w1, b1, w2, b2):
    return fused_mlp(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _mlp_bwd(res, g):
    """Backward with the recompute+elementwise stage in a Pallas kernel
    (h stays VMEM-resident); the four gradient GEMMs stay in XLA where
    they fuse with neighbors. Same GEMM count as the unfused path."""
    x, w1, b1, w2, b2 = res
    r, d = x.shape
    f = w1.shape[1]
    da = (g @ w2.T.astype(g.dtype)).astype(x.dtype)          # (R, F)
    bm = _rows_block(r)
    a, dh = pl.pallas_call(
        _bwd_dh_kernel,
        grid=(r // bm,),
        in_specs=[
            pl.BlockSpec((bm, d), lambda i: (i, 0)),
            pl.BlockSpec((d, f), lambda i: (0, 0)),          # resident
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((bm, f), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, f), lambda i: (i, 0)),
            pl.BlockSpec((bm, f), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, f), x.dtype),
            jax.ShapeDtypeStruct((r, f), x.dtype),
        ],
        compiler_params=_compiler_params(),
        interpret=_use_interpret(),
    )(x, w1, b1.reshape(1, f).astype(jnp.float32), da)
    dh32 = dh.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    dx = (dh @ w1.T.astype(dh.dtype)).astype(x.dtype)
    dw1 = (x.astype(jnp.float32).T @ dh32).astype(w1.dtype)
    db1 = jnp.sum(dh32, axis=0).astype(b1.dtype)
    dw2 = (a.astype(jnp.float32).T @ g32).astype(w2.dtype)
    db2 = jnp.sum(g32, axis=0).astype(b2.dtype)
    return dx, dw1, db1, dw2, db2


fused_mlp.defvjp(_mlp_fwd, _mlp_bwd)
