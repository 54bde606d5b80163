"""Packed windowed-attention v2 kernel vs jnp oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.ops.windowed_attention_v2 import (
    SUBLANE_H, pack_rel_tables, windowed_attention_packed)


def _oracle_packed(qkv, rel_h, rel_w, scale, num_heads, hw):
    """Per-head jnp attention on the packed layout."""
    h, w = hw
    bw, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    outs = []
    for hi in range(num_heads):
        q = qkv[:, :, d * hi:d * (hi + 1)]
        k = qkv[:, :, c + d * hi:c + d * (hi + 1)]
        v = qkv[:, :, 2 * c + d * hi:2 * c + d * (hi + 1)]
        s = jnp.einsum("bqc,bkc->bqk", q * scale, k).astype(jnp.float32)
        s5 = s.reshape(bw, n, h, w)
        s5 = s5 + rel_h[:, hi][..., :, None] + rel_w[:, hi][..., None, :]
        p = jax.nn.softmax(s5.reshape(bw, n, n), axis=-1)
        outs.append(jnp.einsum("bqk,bkc->bqc", p.astype(qkv.dtype), v))
    return jnp.concatenate(outs, axis=-1)


def _inputs(rng, bw=9, h=4, w=4, heads=4, d=32):
    n = h * w
    c = heads * d
    qkv = rng.normal(size=(bw, n, 3 * c)).astype(np.float32)
    rel_h = (rng.normal(size=(bw, heads, n, h)) * 0.5).astype(np.float32)
    rel_w = (rng.normal(size=(bw, heads, n, w)) * 0.5).astype(np.float32)
    return tuple(map(jnp.asarray, (qkv, rel_h, rel_w)))


def test_pack_rel_tables_layout(rng):
    qkv, rel_h, rel_w = _inputs(rng, bw=2)
    hp, wp = pack_rel_tables(rel_h, rel_w, 4, (4, 4))
    assert hp.shape == (2, 16, 4 * SUBLANE_H)
    # head hi occupies lanes [16*hi, 16*hi + kh)
    for hi in range(4):
        np.testing.assert_array_equal(
            np.asarray(hp[:, :, SUBLANE_H * hi:SUBLANE_H * hi + 4]),
            np.asarray(rel_h[:, hi]))
        np.testing.assert_array_equal(
            np.asarray(hp[:, :, SUBLANE_H * hi + 4:SUBLANE_H * (hi + 1)]), 0)


@pytest.mark.parametrize("bw", [8, 9])  # 9 exercises group padding
def test_forward_matches_oracle(rng, bw):
    qkv, rel_h, rel_w = _inputs(rng, bw=bw)
    hp, wp = pack_rel_tables(rel_h, rel_w, 4, (4, 4))
    out = windowed_attention_packed(qkv, hp, wp, 0.25, 4, (4, 4))
    want = _oracle_packed(qkv, rel_h, rel_w, 0.25, 4, (4, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_rectangular_window(rng):
    qkv, rel_h, rel_w = (jnp.asarray(x) for x in (
        np.random.default_rng(1).normal(size=(3, 8, 3 * 64)).astype(np.float32),
        np.random.default_rng(2).normal(size=(3, 2, 8, 2)).astype(np.float32),
        np.random.default_rng(3).normal(size=(3, 2, 8, 4)).astype(np.float32)))
    hp, wp = pack_rel_tables(rel_h, rel_w, 2, (2, 4))
    out = windowed_attention_packed(qkv, hp, wp, 0.3, 2, (2, 4))
    want = _oracle_packed(qkv, rel_h, rel_w, 0.3, 2, (2, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match(rng):
    qkv, rel_h, rel_w = _inputs(rng, bw=5, heads=2, d=16)
    hp, wp = pack_rel_tables(rel_h, rel_w, 2, (4, 4))
    g = jnp.asarray(rng.normal(size=(5, 16, 32)).astype(np.float32))

    def lf(qkv_, hp_, wp_):
        return jnp.sum(
            windowed_attention_packed(qkv_, hp_, wp_, 0.25, 2, (4, 4)) * g)

    def lr(qkv_, rh_, rw_):
        return jnp.sum(_oracle_packed(qkv_, rh_, rw_, 0.25, 2, (4, 4)) * g)

    gf = jax.grad(lf, argnums=(0, 1, 2))(qkv, hp, wp)
    gr = jax.grad(lr, argnums=(0, 1, 2))(qkv, rel_h, rel_w)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=5e-4, rtol=1e-3, err_msg="dqkv")
    # rel grads: unpack the padded-lane layout back to per-head tables
    for packed, want, width, name in ((gf[1], gr[1], 4, "drel_h"),
                                      (gf[2], gr[2], 4, "drel_w")):
        got = np.stack(
            [np.asarray(packed[:, :, SUBLANE_H * hi:SUBLANE_H * hi + width])
             for hi in range(2)], axis=1)
        np.testing.assert_allclose(got, np.asarray(want),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_block_packed_vs_grouped_impls(rng):
    """The v2 (packed) and v1 (grouped) windowed paths must agree inside a
    real Block (reference parity chain: both equal the plain jnp path)."""
    from wildlifemapper_tpu.models.vit import Block

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    kwargs = dict(dim=64, num_heads=4, window_size=4, input_size=(8, 8))
    b_plain = Block(use_flash=False, **kwargs)
    b_v1 = Block(use_flash=True, attn_impl="grouped", **kwargs)
    b_v2 = Block(use_flash=True, attn_impl="packed", **kwargs)
    params = b_plain.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32)) * 0.1, params)
    want = np.asarray(b_plain.apply(params, x))
    np.testing.assert_allclose(np.asarray(b_v1.apply(params, x)), want,
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(b_v2.apply(params, x)), want,
                               atol=2e-5, rtol=1e-4)


def test_block_window12_production_shape(rng):
    """Production window size (12, the exact-tiling choice for the 48-grid)
    through a real Block: packed kernel vs the plain jnp path on a 24x24
    grid (4 windows, no padding)."""
    from wildlifemapper_tpu.models.vit import Block

    x = jnp.asarray(rng.normal(size=(1, 24, 24, 64)).astype(np.float32))
    kwargs = dict(dim=64, num_heads=4, window_size=12, input_size=(24, 24))
    b_plain = Block(use_flash=False, **kwargs)
    b_v2 = Block(use_flash=True, attn_impl="packed", **kwargs)
    params = b_plain.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32)) * 0.1, params)
    want = np.asarray(b_plain.apply(params, x))
    np.testing.assert_allclose(np.asarray(b_v2.apply(params, x)), want,
                               atol=2e-5, rtol=1e-4)
