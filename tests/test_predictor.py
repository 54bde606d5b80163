"""Interactive predictor compat-surface test."""

import numpy as np

import jax

from tests.test_model import tiny_config
from wildlifemapper_tpu.compat.predictor import WildlifeMapperPredictor
from wildlifemapper_tpu.models import WildlifeMapper


def test_predictor_roundtrip(rng):
    cfg = tiny_config()
    m = WildlifeMapper(cfg)
    params = m.init(jax.random.PRNGKey(0),
                    np.zeros((1, 64, 64, 3), np.float32))
    pred = WildlifeMapperPredictor(m, params, cfg)
    assert not pred.is_image_set

    img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
    pred.set_image(img)
    assert pred.is_image_set
    emb = pred.get_image_embedding()
    assert emb.shape[1:3] == (cfg.grid_size, cfg.grid_size)

    out = pred.predict(score_threshold=0.0, apply_nms=True)
    assert out["boxes"].shape[1] == 4
    assert len(out["boxes"]) > 0  # threshold 0 keeps something

    # decoder-only re-predict must match full-model outputs on same input
    out2 = pred.predict(score_threshold=0.0, apply_nms=False)
    assert len(out2["boxes"]) >= len(out["boxes"])

    pred.reset_image()
    assert not pred.is_image_set
