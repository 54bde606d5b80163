"""Content-crop fast path (ModelConfig.content_size).

The reference always computes on the full zero-padded canvas
(misc.py:50, dataloader_coco.py:278-290); content crop drops the bias-only
pad tokens after the (exact-parity) prologue. Checkpoint compatibility
requires the param tree to be byte-identical to the full-canvas model.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from wildlifemapper_tpu.models import WildlifeMapper

from test_model import tiny_config


def _zero_padded_input(rng, b, img, content):
    x = np.zeros((b, img, img, 3), np.float32)
    x[:, :content, :content, :] = rng.normal(size=(b, content, content, 3))
    return jnp.asarray(x)


def test_content_size_equal_img_size_is_identity():
    cfg = tiny_config()
    cfg_crop = dataclasses.replace(cfg, content_size=cfg.img_size)
    x = _zero_padded_input(np.random.default_rng(0), 2, 64, 64)
    m, mc = WildlifeMapper(cfg), WildlifeMapper(cfg_crop)
    params = m.init(jax.random.PRNGKey(0), x)
    o_full = m.apply(params, x)
    o_crop = mc.apply(params, x)
    np.testing.assert_array_equal(np.asarray(o_full["pred_boxes"]),
                                  np.asarray(o_crop["pred_boxes"]))


def test_param_tree_unchanged_by_crop():
    cfg = tiny_config()
    cfg_crop = dataclasses.replace(cfg, content_size=48)  # grid 4 -> 3
    x = jnp.zeros((1, 64, 64, 3))
    shapes = jax.tree.map(lambda a: a.shape,
                          jax.eval_shape(WildlifeMapper(cfg).init,
                                         jax.random.PRNGKey(0), x))
    shapes_crop = jax.tree.map(lambda a: a.shape,
                               jax.eval_shape(WildlifeMapper(cfg_crop).init,
                                              jax.random.PRNGKey(0), x))
    assert shapes == shapes_crop


def test_crop_close_to_full_on_padded_input():
    cfg = tiny_config()
    cfg_crop = dataclasses.replace(cfg, content_size=48)
    x = _zero_padded_input(np.random.default_rng(1), 2, 64, 48)
    m, mc = WildlifeMapper(cfg), WildlifeMapper(cfg_crop)
    params = m.init(jax.random.PRNGKey(0), x)
    o_full = m.apply(params, x)
    o_crop = jax.jit(lambda p, x: mc.apply(p, x))(params, x)
    assert o_crop["pred_logits"].shape == o_full["pred_logits"].shape
    assert o_crop["pred_boxes"].shape == o_full["pred_boxes"].shape
    d_box = np.abs(np.asarray(o_full["pred_boxes"])
                   - np.asarray(o_crop["pred_boxes"])).max()
    d_log = np.abs(np.asarray(o_full["pred_logits"])
                   - np.asarray(o_crop["pred_logits"])).max()
    assert np.isfinite(np.asarray(o_crop["pred_logits"])).all()
    # Missing pad keys perturb, but outputs must stay close even at random
    # init (sigmoid boxes in [0,1]).
    assert d_box < 0.15, d_box
    assert d_log < 1.5, d_log


def test_crop_prologue_mode():
    """From-scratch mode: the whole prologue runs at content resolution.
    Param tree must stay byte-identical (pos embeds sliced, not resized),
    gradients must flow, and passing already-cropped pixels must give
    bit-identical results to passing the padded canvas."""
    import pytest

    from wildlifemapper_tpu.config import HFCConfig

    cfg = tiny_config()
    hfc_ns = dataclasses.replace(cfg.hfc, compat_scrambled_reshape=False)
    cfg_cp = dataclasses.replace(cfg, content_size=48, hfc=hfc_ns,
                                 crop_prologue=True)
    # validation: scrambled reshape forbids crop_prologue
    with pytest.raises(ValueError):
        dataclasses.replace(cfg, content_size=48, crop_prologue=True)
    with pytest.raises(ValueError):
        dataclasses.replace(cfg, hfc=hfc_ns, crop_prologue=True)

    x = _zero_padded_input(np.random.default_rng(3), 2, 64, 48)
    m_full = WildlifeMapper(tiny_config())
    m_cp = WildlifeMapper(cfg_cp)
    params = m_full.init(jax.random.PRNGKey(0), x)
    shapes = jax.tree.map(lambda a: a.shape, params)
    shapes_cp = jax.tree.map(
        lambda a: a.shape, jax.eval_shape(m_cp.init, jax.random.PRNGKey(0), x))
    assert shapes == shapes_cp

    out = m_cp.apply(params, x)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
    # padded canvas vs pre-cropped pixels: identical (the crop is the
    # first op, so the pad band never participates)
    out2 = m_cp.apply(params, x[:, :48, :48, :])
    np.testing.assert_array_equal(np.asarray(out["pred_boxes"]),
                                  np.asarray(out2["pred_boxes"]))

    def loss(p):
        o = m_cp.apply(p, x)
        return jnp.sum(o["pred_boxes"]) + jnp.sum(o["pred_logits"])

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(v)))
                for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_crop_with_flash_kernels_interpret_mode():
    # Exercise the packed kernel dispatch on the cropped grid (interpret
    # mode on CPU); windowed blocks see a 3x3 grid padded to the 4-window.
    cfg = dataclasses.replace(tiny_config(), content_size=48,
                              use_flash_attention=True)
    x = _zero_padded_input(np.random.default_rng(2), 1, 64, 48)
    m = WildlifeMapper(cfg)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert np.isfinite(np.asarray(out["pred_logits"])).all()
