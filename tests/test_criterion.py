"""Unit tests for the fixed-shape DETR criterion (non-oracle)."""

import numpy as np

import jax
import jax.numpy as jnp

from wildlifemapper_tpu.config import MatchCriterionConfig
from wildlifemapper_tpu.train.criterion import hungarian_match, set_criterion


def _fake_batch(rng, b=2, q=51, t=64, n_valid=(5, 0)):
    logits = rng.normal(size=(b, q, 8)).astype(np.float32)
    boxes = np.clip(rng.uniform(0.1, 0.9, size=(b, q, 4)), 0.05, 0.95
                    ).astype(np.float32)
    labels = np.zeros((b, t), dtype=np.int32)
    tboxes = np.full((b, t, 4), 0.5, dtype=np.float32)
    valid = np.zeros((b, t), dtype=bool)
    for i, n in enumerate(n_valid):
        labels[i, :n] = rng.integers(1, 7, size=n)
        tboxes[i, :n] = rng.uniform(0.2, 0.8, size=(n, 4))
        valid[i, :n] = True
    out = {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)}
    tgt = {"labels": jnp.asarray(labels), "boxes": jnp.asarray(tboxes),
           "valid": jnp.asarray(valid)}
    return out, tgt


def test_empty_targets_give_pure_background_loss(rng):
    out, tgt = _fake_batch(rng, n_valid=(0, 0))
    losses = set_criterion(out, tgt, MatchCriterionConfig())
    assert float(losses["loss_bbox"]) == 0.0
    assert float(losses["loss_giou"]) == 0.0
    assert np.isfinite(float(losses["loss_ce"]))
    assert float(losses["num_boxes"]) == 1.0  # clamped


def test_matching_is_injective(rng):
    out, tgt = _fake_batch(rng, n_valid=(10, 64))
    cols, matched = hungarian_match(out, tgt, MatchCriterionConfig())
    cols, matched = np.asarray(cols), np.asarray(matched)
    for b in range(2):
        mc = cols[b][matched[b]]
        assert len(set(mc.tolist())) == len(mc)  # distinct targets
    assert matched[0].sum() == 10
    assert matched[1].sum() == 51  # 64 targets, only 51 queries


def test_loss_is_differentiable_and_jits(rng):
    out, tgt = _fake_batch(rng, n_valid=(5, 12))
    cfg = MatchCriterionConfig()

    @jax.jit
    def loss_fn(logits, boxes):
        losses = set_criterion(
            {"pred_logits": logits, "pred_boxes": boxes}, tgt, cfg)
        return losses["loss"]

    g_logits, g_boxes = jax.grad(loss_fn, argnums=(0, 1))(
        out["pred_logits"], out["pred_boxes"])
    assert np.isfinite(np.asarray(g_logits)).all()
    assert np.isfinite(np.asarray(g_boxes)).all()
    assert np.abs(np.asarray(g_boxes)).max() > 0


def test_perfect_predictions_low_loss(rng):
    """Queries that exactly hit the targets should incur ~zero box loss."""
    b, q, t = 1, 51, 64
    labels = np.zeros((b, t), dtype=np.int32)
    tboxes = np.full((b, t, 4), 0.5, dtype=np.float32)
    valid = np.zeros((b, t), dtype=bool)
    n = 6
    labels[0, :n] = np.arange(1, 7)
    tboxes[0, :n] = rng.uniform(0.3, 0.7, size=(n, 4))
    valid[0, :n] = True

    logits = np.full((b, q, 8), -10.0, dtype=np.float32)
    logits[..., 7] = 10.0                      # background everywhere
    boxes = np.full((b, q, 4), 0.9, dtype=np.float32)
    logits[0, :n, 7] = -10.0
    for i in range(n):
        logits[0, i, labels[0, i]] = 10.0      # right class
        boxes[0, i] = tboxes[0, i]             # right box

    losses = set_criterion(
        {"pred_logits": jnp.asarray(logits), "pred_boxes": jnp.asarray(boxes)},
        {"labels": jnp.asarray(labels), "boxes": jnp.asarray(tboxes),
         "valid": jnp.asarray(valid)}, MatchCriterionConfig())
    assert float(losses["loss_bbox"]) < 1e-5
    assert float(losses["loss_giou"]) < 1e-4
    assert float(losses["loss_ce"]) < 1e-3
    assert float(losses["class_error"]) == 0.0


def test_aux_loss_plumbing(rng):
    """Deep-supervision: aux outputs add matched losses to the total."""
    out, tgt = _fake_batch(rng, n_valid=(5, 12))
    cfg = MatchCriterionConfig()
    base = set_criterion(out, tgt, cfg)
    out_aux = dict(out)
    out_aux["aux_outputs"] = [
        {"pred_logits": out["pred_logits"] + 0.1,
         "pred_boxes": jnp.clip(out["pred_boxes"] * 0.9, 0.01, 0.99)}]
    with_aux = set_criterion(out_aux, tgt, cfg)
    assert "loss_ce_0" in with_aux and "loss_bbox_0" in with_aux
    assert float(with_aux["loss"]) > float(base["loss"])
    # final-layer losses unchanged by the aux branch
    assert float(with_aux["loss_ce"]) == float(base["loss_ce"])


def test_aux_loss_model_end_to_end(rng):
    import dataclasses

    import jax

    from tests.test_model import tiny_config
    from wildlifemapper_tpu.models import WildlifeMapper

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, decoder=dataclasses.replace(cfg.decoder, aux_loss=True, depth=2))
    m = WildlifeMapper(cfg)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert len(out["aux_outputs"]) == 1  # depth 2 -> one intermediate
    assert out["aux_outputs"][0]["pred_logits"].shape == out["pred_logits"].shape


def test_row_valid_equals_unpadded_batch(rng):
    """Fixed-shape eval pads the final batch by repeating the last example;
    with row_valid masking, every loss must equal evaluating the true
    smaller batch (reference semantics, inference.py:44-56)."""
    out3, tgt3 = _fake_batch(rng, b=3, n_valid=(5, 9, 3))
    # padded 4-row batch: row 3 duplicates row 2
    dup = lambda a: jnp.concatenate([a, a[-1:]], axis=0)
    out4 = {k: dup(v) for k, v in out3.items()}
    tgt4 = {k: dup(v) for k, v in tgt3.items()}
    row_valid = jnp.asarray([True, True, True, False])

    cfg = MatchCriterionConfig()
    ref = set_criterion(out3, tgt3, cfg)
    got = set_criterion(out4, tgt4, cfg, row_valid=row_valid)
    for k in ("loss", "loss_ce", "loss_bbox", "loss_giou", "class_error",
              "cardinality_error", "num_boxes"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-5,
                                   err_msg=k)


def test_class_error_matches_reference_transcription(rng):
    """Pin class_error to a numpy transcription of the reference's exact
    formula: build_sam.py:111 `100 - accuracy(src_logits[idx][..., :-1],
    target_classes_o)[0]` with misc.py:87 accuracy (top-1 over the sliced
    logits, normalized by the number of matched queries)."""
    out, tgt = _fake_batch(rng, b=2, n_valid=(7, 4))
    cfg = MatchCriterionConfig()
    losses = set_criterion(out, tgt, cfg)

    cols, matched = hungarian_match(out, tgt, cfg)
    cols, matched = np.asarray(cols), np.asarray(matched)
    logits = np.asarray(out["pred_logits"])
    labels = np.asarray(tgt["labels"])
    # reference: gather matched (src) logits and their target classes
    src_logits, target_classes_o = [], []
    for b in range(logits.shape[0]):
        for q in np.nonzero(matched[b])[0]:
            src_logits.append(logits[b, q])
            target_classes_o.append(labels[b, cols[b, q]])
    src_logits = np.stack(src_logits)[..., :-1]  # slice BEFORE argmax
    target_classes_o = np.asarray(target_classes_o)
    acc = 100.0 * np.mean(src_logits.argmax(-1) == target_classes_o)
    np.testing.assert_allclose(float(losses["class_error"]), 100.0 - acc,
                               rtol=1e-5)
