"""MetricLogger / SmoothedValue / JSONL logger tests."""

import json

from wildlifemapper_tpu.train.logging import (JsonlLogger, NoOpLogger,
                                              setup_logger)
from wildlifemapper_tpu.train.metrics import MetricLogger, SmoothedValue


def test_smoothed_value_window():
    s = SmoothedValue(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        s.update(v)
    assert s.median == 3.0          # window holds 2,3,4
    assert s.avg == 3.0
    assert s.global_avg == 2.5      # all four
    assert s.value == 4.0


def test_metric_logger_log_every(capsys):
    lines = []
    logger = MetricLogger(print_fn=lines.append)
    total = 0
    for x in logger.log_every(range(7), print_freq=3, header="T:"):
        logger.update(loss=float(x))
        total += x
    assert total == 21
    assert any("eta" in ln for ln in lines)
    assert any("Total time" in ln for ln in lines)
    assert logger.global_averages()["loss"] == 3.0


def test_jsonl_logger_roundtrip(tmp_path):
    lg = JsonlLogger(str(tmp_path), config={"lr": 1e-4}, run_name="t")
    lg.log_batch(0, 10, {"loss": 1.5})
    lg.log_epoch(0, {"val/AP": 0.3})
    lg.log_summary({"best": 0.4})
    lg.finish()
    events = [json.loads(l) for l in open(tmp_path / "t.jsonl")]
    kinds = [e["event"] for e in events]
    assert kinds == ["config", "batch", "epoch", "summary"]
    assert events[1]["loss"] == 1.5
    assert events[0]["config"]["lr"] == 1e-4


def test_setup_logger_fallbacks(tmp_path):
    assert isinstance(setup_logger(False, str(tmp_path)), NoOpLogger)
    # wandb missing in this image -> JSONL fallback
    lg = setup_logger(True, str(tmp_path), config=None, run_name="x")
    assert isinstance(lg, JsonlLogger)
    lg.finish()


def test_jsonl_image_logging(tmp_path):
    import numpy as np

    lg = JsonlLogger(str(tmp_path), run_name="imgs")
    img = np.zeros((32, 32, 3), np.float32)
    det = {"boxes": [[2, 2, 20, 20]], "labels": [3], "scores": [0.9]}
    lg.log_images(1, [img], [det])
    lg.finish()
    files = list((tmp_path / "imgs_images").glob("*.jpg"))
    assert len(files) == 1


def test_masks_to_boxes():
    import jax.numpy as jnp
    import numpy as np

    from wildlifemapper_tpu.ops.boxes import masks_to_boxes

    m = np.zeros((2, 8, 8), bool)
    m[0, 2:5, 3:7] = True
    out = np.asarray(masks_to_boxes(jnp.asarray(m)))
    np.testing.assert_array_equal(out[0], [3, 2, 6, 4])
    np.testing.assert_array_equal(out[1], [0, 0, 0, 0])
