"""Fused MLP kernel vs the plain Dense path (interpret mode)."""

import numpy as np

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.models.common import MLPBlock
from wildlifemapper_tpu.ops.fused_mlp import fused_mlp


def _oracle(x, w1, b1, w2, b2):
    h = x.astype(jnp.float32) @ w1.astype(jnp.float32) + b1
    a = 0.5 * h * (1.0 + jax.lax.erf(h * (2.0 ** -0.5)))
    return (a.astype(x.dtype) @ w2.astype(jnp.float32) + b2).astype(x.dtype)


def _inputs(rng, r=48, d=32, f=64):
    x = rng.normal(size=(r, d)).astype(np.float32)
    w1 = (rng.normal(size=(d, f)) * 0.1).astype(np.float32)
    b1 = rng.normal(size=(f,)).astype(np.float32)
    w2 = (rng.normal(size=(f, d)) * 0.1).astype(np.float32)
    b2 = rng.normal(size=(d,)).astype(np.float32)
    return tuple(map(jnp.asarray, (x, w1, b1, w2, b2)))


def test_forward_matches_oracle(rng):
    args = _inputs(rng)
    out = fused_mlp(*args)
    want = _oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_multiple_row_blocks(rng):
    args = _inputs(rng, r=256)
    out = fused_mlp(*args)
    want = _oracle(*args)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_grad_matches_oracle(rng):
    args = _inputs(rng)

    g1 = jax.grad(lambda *a: jnp.sum(jnp.sin(fused_mlp(*a))),
                  argnums=tuple(range(5)))(*args)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(_oracle(*a))),
                  argnums=tuple(range(5)))(*args)
    for a, b, name in zip(g1, g2, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=name)


def test_mlpblock_fused_matches_dense_path(rng):
    """Same params drive both paths (checkpoint interchangeability +
    numerics)."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
    plain = MLPBlock(mlp_dim=64, out_dim=32, use_fused=False)
    fused = MLPBlock(mlp_dim=64, out_dim=32, use_fused=True)
    params = plain.init(jax.random.PRNGKey(0), x)
    params_f = fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f))
    a = plain.apply(params, x)
    b = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-4)
