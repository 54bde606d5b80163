"""Extra augmentation ops + export + distributed-helper tests."""

import numpy as np

from wildlifemapper_tpu.data.augment_extra import (augment_hsv, cutout,
                                                   hsv_to_rgb, mixup,
                                                   rgb_to_hsv)


def test_hsv_roundtrip(rng):
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    back = hsv_to_rgb(rgb_to_hsv(img))
    assert np.abs(back.astype(int) - img.astype(int)).max() <= 2


def test_augment_hsv_changes_image(rng):
    img = rng.integers(40, 200, (16, 16, 3), dtype=np.uint8)
    out = augment_hsv(img, rng)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert (out != img).any()


def test_mixup_concatenates_targets(rng):
    i1 = np.zeros((8, 8, 3), np.uint8)
    i2 = np.full((8, 8, 3), 255, np.uint8)
    t1 = {"boxes": np.asarray([[0, 0, 4, 4.0]]), "labels": np.asarray([1])}
    t2 = {"boxes": np.asarray([[2, 2, 6, 6.0]]), "labels": np.asarray([2])}
    img, tgt = mixup(i1, t1, i2, t2, rng)
    assert len(tgt["boxes"]) == 2
    assert 50 < img.mean() < 205  # genuinely blended


def test_cutout_keeps_shape(rng):
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    boxes = np.asarray([[0, 0, 10, 10.0], [40, 40, 60, 60]])
    out, keep = cutout(img, boxes, rng)
    assert out.shape == img.shape and keep.shape == (2,)


def test_distributed_helpers_single_process():
    from wildlifemapper_tpu.parallel import distributed as dist

    assert dist.get_world_size() == 1
    assert dist.is_main_process()
    assert dist.all_gather_objects({"a": 1}) == [{"a": 1}]
    assert dist.init_distributed_mode() is False


def test_export_roundtrip():
    import jax
    import jax.numpy as jnp

    from tests.test_model import tiny_config
    from wildlifemapper_tpu.compat.export import (load_exported,
                                                  save_exported)
    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = save_exported(m, params, f"{d}/model.stablehlo", img_size=64)
        call = load_exported(str(path))
        out = call(params, x)
        want = m.apply(params, x)
        np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                                   np.asarray(want["pred_logits"]),
                                   atol=1e-5, rtol=1e-5)


def test_export_polymorphic_batch():
    """batch_size=None exports one artifact serving any batch size."""
    import jax
    import jax.numpy as jnp

    from tests.test_model import tiny_config
    from wildlifemapper_tpu.compat.export import (load_exported,
                                                  save_exported)
    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        path = save_exported(m, params, f"{d}/model.stablehlo",
                             batch_size=None, img_size=64)
        call = load_exported(str(path))
        for b in (1, 3):
            x = jnp.ones((b, 64, 64, 3))
            out = call(params, x)
            assert out["pred_logits"].shape[0] == b
            want = m.apply(params, x)
            np.testing.assert_allclose(np.asarray(out["pred_logits"]),
                                       np.asarray(want["pred_logits"]),
                                       atol=1e-4, rtol=1e-4)
