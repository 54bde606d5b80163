"""Packed cross-attention kernel (HFC adaptor) vs jnp oracle, interpret
mode; plus the adaptor wiring (flash path == XLA path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.ops.cross_attention import cross_attention_packed


def _oracle(q, k, v, scale, num_heads):
    b, n, c = q.shape
    d = c // num_heads
    outs = []
    for h in range(num_heads):
        qh = q[:, :, d * h:d * (h + 1)]
        kh = k[:, :, d * h:d * (h + 1)]
        vh = v[:, :, d * h:d * (h + 1)]
        s = jnp.einsum("bqc,bkc->bqk", qh * scale, kh).astype(jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("bqk,bkc->bqc", p.astype(q.dtype), vh))
    return jnp.concatenate(outs, axis=-1)


def _inputs(rng, b=2, n=64, m=48, heads=4, d=32):
    c = heads * d
    q = rng.normal(size=(b, n, c)).astype(np.float32)
    k = rng.normal(size=(b, m, c)).astype(np.float32)
    v = rng.normal(size=(b, m, c)).astype(np.float32)
    return tuple(map(jnp.asarray, (q, k, v)))


@pytest.mark.parametrize("nm", [(64, 64), (64, 48)])  # incl. nq != nk
def test_forward_matches_oracle(rng, nm):
    n, m = nm
    q, k, v = _inputs(rng, n=n, m=m)
    out = cross_attention_packed(q, k, v, 0.25, 4)
    want = _oracle(q, k, v, 0.25, 4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_grad_matches_oracle(rng):
    q, k, v = _inputs(rng, b=1, n=32, m=48, heads=2, d=16)

    def loss_kernel(q, k, v):
        o = cross_attention_packed(q, k, v, 0.3, 2)
        return jnp.sum(jnp.sin(o))

    def loss_oracle(q, k, v):
        return jnp.sum(jnp.sin(_oracle(q, k, v, 0.3, 2)))

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "q k v".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=1e-3, err_msg=name)


def test_multiple_blocks(rng):
    """Shapes large enough that fwd/bwd iterate several q- and k-blocks
    (256 rows -> two 128 blocks under the fallback divisor rule)."""
    q, k, v = _inputs(rng, b=1, n=256, m=256, heads=2, d=16)

    out = cross_attention_packed(q, k, v, 0.25, 2)
    want = _oracle(q, k, v, 0.25, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)

    g = jax.grad(lambda *a: jnp.sum(cross_attention_packed(*a, 0.25, 2) ** 2),
                 argnums=(0, 1, 2))(q, k, v)
    go = jax.grad(lambda *a: jnp.sum(_oracle(*a, 0.25, 2) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_adaptor_flash_path_matches_xla_path(rng):
    """MultiheadAttention(use_flash=True) must equal the plain XLA path —
    the serving tiers flip this flag and claim mAP-exactness."""
    from wildlifemapper_tpu.models.adaptor import MultiheadAttention

    q = jnp.asarray(rng.normal(size=(2, 36, 64)).astype(np.float32))
    kv = jnp.asarray(rng.normal(size=(2, 36, 64)).astype(np.float32))

    mha_x = MultiheadAttention(dim=64, num_heads=4, use_flash=False)
    mha_f = MultiheadAttention(dim=64, num_heads=4, use_flash=True)
    params = mha_x.init(jax.random.PRNGKey(0), q, kv, kv)
    a = mha_x.apply(params, q, kv, kv)
    b = mha_f.apply(params, q, kv, kv)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=1e-4)
