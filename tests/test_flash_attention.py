"""Flash-attention kernel vs the materializing jnp oracle (interpret mode on
CPU), forward and backward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.ops.flash_attention import (
    flash_attention_rel_pos, reference_attention_rel_pos)


def _inputs(rng, bh=4, h=8, w=8, d=32):
    n = h * w
    q = rng.normal(size=(bh, n, d)).astype(np.float32)
    k = rng.normal(size=(bh, n, d)).astype(np.float32)
    v = rng.normal(size=(bh, n, d)).astype(np.float32)
    rel_h = (rng.normal(size=(bh, n, h)) * 0.5).astype(np.float32)
    rel_w = (rng.normal(size=(bh, n, w)) * 0.5).astype(np.float32)
    return tuple(map(jnp.asarray, (q, k, v, rel_h, rel_w))), (h, w)


def test_forward_matches_reference(rng):
    (q, k, v, rh, rw), hw = _inputs(rng)
    scale = 1.0 / np.sqrt(q.shape[-1])
    out = flash_attention_rel_pos(q, k, v, rh, rw, scale, hw)
    want = reference_attention_rel_pos(q, k, v, rh, rw, scale, hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_forward_nonsquare_grid(rng):
    (q, k, v, rh, rw), hw = _inputs(rng, bh=2, h=4, w=16, d=16)
    scale = 0.25
    out = flash_attention_rel_pos(q, k, v, rh, rw, scale, hw)
    want = reference_attention_rel_pos(q, k, v, rh, rw, scale, hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_reference(rng):
    (q, k, v, rh, rw), hw = _inputs(rng, bh=2, h=4, w=4, d=16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss_flash(q, k, v, rh, rw):
        return jnp.sum(flash_attention_rel_pos(q, k, v, rh, rw, scale, hw) * g)

    def loss_ref(q, k, v, rh, rw):
        return jnp.sum(reference_attention_rel_pos(q, k, v, rh, rw, scale, hw) * g)

    grads_f = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    for name, gf, gr in zip("q k v rel_h rel_w".split(), grads_f, grads_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_gradients_nonsquare_grid(rng):
    (q, k, v, rh, rw), hw = _inputs(rng, bh=2, h=4, w=16, d=16)
    scale = 0.25
    g = jnp.asarray(rng.normal(size=q.shape).astype(np.float32))

    def loss_flash(*args):
        return jnp.sum(flash_attention_rel_pos(*args, scale, hw) * g)

    def loss_ref(*args):
        return jnp.sum(reference_attention_rel_pos(*args, scale, hw) * g)

    grads_f = jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    grads_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, rh, rw)
    for name, gf, gr in zip("q k v rel_h rel_w".split(), grads_f, grads_r):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3, err_msg=name)


def test_gradients_with_4d_rel_tables(rng):
    """The encoder passes rel tables as (BH, qh, qw, k); cotangents must
    come back in that shape."""
    (q, k, v, rh, rw), (h, w) = _inputs(rng, bh=2, h=4, w=4, d=16)
    rh4 = rh.reshape(2, h, w, h)
    rw4 = rw.reshape(2, h, w, w)

    def loss(q, rh4_, rw4_):
        return jnp.sum(
            flash_attention_rel_pos(q, k, v, rh4_, rw4_, 0.25, (h, w)) ** 2)

    gq, grh, grw = jax.grad(loss, argnums=(0, 1, 2))(q, rh4, rw4)
    assert grh.shape == rh4.shape and grw.shape == rw4.shape
    assert np.isfinite(np.asarray(gq)).all()


def test_vit_block_with_flash_matches_plain(rng):
    """RelPosAttention(use_flash=True) == use_flash=False on a global block."""
    from wildlifemapper_tpu.models.vit import RelPosAttention

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    a_plain = RelPosAttention(dim=64, num_heads=4, input_size=(8, 8),
                              use_flash=False)
    a_flash = RelPosAttention(dim=64, num_heads=4, input_size=(8, 8),
                              use_flash=True)
    params = a_plain.init(jax.random.PRNGKey(0), x)
    # non-zero rel pos for a meaningful test
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, ).astype(np.float32)) * 0.1,
        params)
    out_p = a_plain.apply(params, x)
    out_f = a_flash.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=2e-5, rtol=1e-4)
