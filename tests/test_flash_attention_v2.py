"""Packed global flash-attention v2 kernel vs jnp oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.ops.flash_attention_v2 import (flash_attention_packed,
                                                       pack_rel_global)


def _oracle(qkv, rel_h, rel_w, scale, num_heads, hw):
    h, w = hw
    b, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    outs = []
    for hi in range(num_heads):
        q = qkv[:, :, d * hi:d * (hi + 1)]
        k = qkv[:, :, c + d * hi:c + d * (hi + 1)]
        v = qkv[:, :, 2 * c + d * hi:2 * c + d * (hi + 1)]
        s = jnp.einsum("bqc,bkc->bqk", q * scale, k).astype(jnp.float32)
        s5 = s.reshape(b, n, h, w)
        s5 = s5 + rel_h[:, hi][..., :, None] + rel_w[:, hi][..., None, :]
        p = jax.nn.softmax(s5.reshape(b, n, n), axis=-1)
        outs.append(jnp.einsum("bqk,bkc->bqc", p.astype(qkv.dtype), v))
    return jnp.concatenate(outs, axis=-1)


def _inputs(rng, b=2, h=8, w=8, heads=4, d=32):
    n = h * w
    c = heads * d
    qkv = rng.normal(size=(b, n, 3 * c)).astype(np.float32)
    rel_h = (rng.normal(size=(b, heads, n, h)) * 0.5).astype(np.float32)
    rel_w = (rng.normal(size=(b, heads, n, w)) * 0.5).astype(np.float32)
    return tuple(map(jnp.asarray, (qkv, rel_h, rel_w)))


def test_fast_softmax_exp_within_bf16_tolerance(rng, monkeypatch):
    """FAST_SOFTMAX_EXP (serving knob, default off) must stay within bf16
    rounding of the f32 softmax — p is cast to bf16 for the PV matmul
    either way, so only the normalizer's precision changes."""
    import wildlifemapper_tpu.ops.flash_attention_v2 as fa2

    qkv, rel_h, rel_w = _inputs(rng)
    rhT, rw = pack_rel_global(rel_h, rel_w, 4, (8, 8))
    assert fa2.FAST_SOFTMAX_EXP is False  # default of record
    base = np.asarray(flash_attention_packed(qkv, rhT, rw, 0.25, 4, (8, 8)))
    monkeypatch.setattr(fa2, "FAST_SOFTMAX_EXP", True)
    fast = np.asarray(flash_attention_packed(qkv, rhT, rw, 0.25, 4, (8, 8)))
    np.testing.assert_allclose(fast, base, atol=2e-2, rtol=2e-2)
    assert np.abs(fast - base).mean() < 2e-3


@pytest.mark.parametrize("hw", [(8, 8), (4, 8)])  # incl. non-square grid
def test_forward_matches_oracle(rng, hw):
    h, w = hw
    qkv, rel_h, rel_w = _inputs(rng, h=h, w=w)
    rhT, rw = pack_rel_global(rel_h, rel_w, 4, hw)
    out = flash_attention_packed(qkv, rhT, rw, 0.25, 4, hw)
    want = _oracle(qkv, rel_h, rel_w, 0.25, 4, hw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_multiple_q_blocks(rng):
    """n large enough that the grid iterates several q blocks (the k
    dimension is always full-width in the single-pass-softmax kernel)."""
    import wildlifemapper_tpu.ops.flash_attention_v2 as fa2
    old_bq = fa2.DEFAULT_BQ
    fa2.DEFAULT_BQ = 32
    try:
        qkv, rel_h, rel_w = _inputs(rng, b=1, h=8, w=8, heads=2, d=16)
        rhT, rw = pack_rel_global(rel_h, rel_w, 2, (8, 8))
        out = flash_attention_packed(qkv, rhT, rw, 0.25, 2, (8, 8))
        want = _oracle(qkv, rel_h, rel_w, 0.25, 2, (8, 8))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)
    finally:
        fa2.DEFAULT_BQ = old_bq


def test_non_pow2_grid(rng):
    """Content-crop shape analog: a grid width that does not divide a
    power-of-two q-block (48-grid on the real model; 12-grid here)."""
    import wildlifemapper_tpu.ops.flash_attention_v2 as fa2
    old_bq = fa2.DEFAULT_BQ
    fa2.DEFAULT_BQ = 48
    try:
        qkv, rel_h, rel_w = _inputs(rng, b=1, h=12, w=12, heads=2, d=16)
        rhT, rw = pack_rel_global(rel_h, rel_w, 2, (12, 12))
        out = flash_attention_packed(qkv, rhT, rw, 0.25, 2, (12, 12))
        want = _oracle(qkv, rel_h, rel_w, 0.25, 2, (12, 12))
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)
    finally:
        fa2.DEFAULT_BQ = old_bq


def test_gradients_match(rng):
    qkv, rel_h, rel_w = _inputs(rng, b=1, h=4, w=4, heads=2, d=16)
    rhT, rw = pack_rel_global(rel_h, rel_w, 2, (4, 4))
    g = jnp.asarray(rng.normal(size=(1, 16, 32)).astype(np.float32))

    def lf(qkv_, rhT_, rw_):
        return jnp.sum(
            flash_attention_packed(qkv_, rhT_, rw_, 0.25, 2, (4, 4)) * g)

    def lr(qkv_, rh_, rw_):
        return jnp.sum(_oracle(qkv_, rh_, rw_, 0.25, 2, (4, 4)) * g)

    gf = jax.grad(lf, argnums=(0, 1, 2))(qkv, rhT, rw)
    gr = jax.grad(lr, argnums=(0, 1, 2))(qkv, rel_h, rel_w)
    np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                               atol=5e-4, rtol=1e-3, err_msg="dqkv")
    want_rhT, want_rw = pack_rel_global(gr[1], gr[2], 2, (4, 4))
    np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(want_rhT),
                               atol=5e-4, rtol=1e-3, err_msg="drhT")
    np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(want_rw),
                               atol=5e-4, rtol=1e-3, err_msg="drw")


def test_relpos_attention_packed_global_matches_plain(rng, monkeypatch):
    """The packed-global dispatch inside RelPosAttention equals the plain
    jnp path (threshold patched so an 8x8 grid routes global)."""
    import wildlifemapper_tpu.models.vit as vit

    monkeypatch.setattr(vit, "GLOBAL_N_THRESHOLD", 64)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    a_plain = vit.RelPosAttention(dim=64, num_heads=4, input_size=(8, 8),
                                  use_flash=False)
    a_packed = vit.RelPosAttention(dim=64, num_heads=4, input_size=(8, 8),
                                   use_flash=True, attn_impl="packed")
    params = a_plain.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32)) * 0.1, params)
    np.testing.assert_allclose(np.asarray(a_packed.apply(params, x)),
                               np.asarray(a_plain.apply(params, x)),
                               atol=2e-5, rtol=1e-4)


def test_relpos_attention_packed_global_grads(rng, monkeypatch):
    """End-to-end grads through the packed-global VJP (packed two-kernel
    backward) match the plain path."""
    import wildlifemapper_tpu.models.vit as vit

    monkeypatch.setattr(vit, "GLOBAL_N_THRESHOLD", 64)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 64)).astype(np.float32))
    a_plain = vit.RelPosAttention(dim=64, num_heads=4, input_size=(8, 8),
                                  use_flash=False)
    a_packed = vit.RelPosAttention(dim=64, num_heads=4, input_size=(8, 8),
                                   use_flash=True, attn_impl="packed")
    params = a_plain.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(
        lambda p: jnp.asarray(
            rng.normal(size=p.shape).astype(np.float32)) * 0.1, params)

    def loss(mod):
        return lambda p, x_: jnp.sum(jnp.tanh(mod.apply(p, x_)))

    gp = jax.grad(loss(a_plain))(params, x)
    gf = jax.grad(loss(a_packed))(params, x)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
    for path, val in flat_p:
        np.testing.assert_allclose(np.asarray(flat_f[path]),
                                   np.asarray(val), atol=5e-4, rtol=1e-3,
                                   err_msg=str(path))


def test_gradients_match_multiple_blocks(rng):
    """Backward with several q/k blocks: exercises the dkv kernel's
    k0-offset expansion matrices and the dq kernel's block slicing."""
    import wildlifemapper_tpu.ops.flash_attention_v2 as fa2

    old_bq = fa2.DEFAULT_BQ
    fa2.DEFAULT_BQ = 16
    try:
        qkv, rel_h, rel_w = _inputs(rng, b=2, h=8, w=8, heads=2, d=16)
        rhT, rw = pack_rel_global(rel_h, rel_w, 2, (8, 8))
        g = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))

        def lf(qkv_, rhT_, rw_):
            return jnp.sum(
                flash_attention_packed(qkv_, rhT_, rw_, 0.25, 2, (8, 8)) * g)

        def lr(qkv_, rh_, rw_):
            return jnp.sum(_oracle(qkv_, rh_, rw_, 0.25, 2, (8, 8)) * g)

        gf = jax.grad(lf, argnums=(0, 1, 2))(qkv, rhT, rw)
        gr = jax.grad(lr, argnums=(0, 1, 2))(qkv, rel_h, rel_w)
        np.testing.assert_allclose(np.asarray(gf[0]), np.asarray(gr[0]),
                                   atol=5e-4, rtol=1e-3, err_msg="dqkv")
        want_rhT, want_rw = pack_rel_global(gr[1], gr[2], 2, (8, 8))
        np.testing.assert_allclose(np.asarray(gf[1]), np.asarray(want_rhT),
                                   atol=5e-4, rtol=1e-3, err_msg="drh")
        np.testing.assert_allclose(np.asarray(gf[2]), np.asarray(want_rw),
                                   atol=5e-4, rtol=1e-3, err_msg="drw")
    finally:
        fa2.DEFAULT_BQ = old_bq
