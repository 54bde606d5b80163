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


def test_jsonl_histograms_tables_artifacts(tmp_path):
    """Round-2 logging depth (wandb_logger.py:101-120, 272-329 parity):
    histograms summarize pytree leaves, tables and artifacts are recorded."""
    import json

    import jax.numpy as jnp

    from wildlifemapper_tpu.train.logging import JsonlLogger

    lg = JsonlLogger(str(tmp_path), run_name="t")
    params = {"block": {"kernel": jnp.arange(12.0).reshape(3, 4),
                        "bias": jnp.zeros(4)}}
    lg.log_histograms(0, params)
    lg.log_table("per_class_ap", ["class", "ap"], [["zebra", 0.5]])
    lg.log_artifact(str(tmp_path / "ckpt"), "best_checkpoint",
                    metadata={"epoch": 3, "loss": 1.25})
    lg.finish()

    events = [json.loads(l) for l in
              (tmp_path / "t.jsonl").read_text().splitlines()]
    kinds = [e["event"] for e in events]
    assert kinds == ["histograms", "table", "artifact"]
    h = events[0]["histograms"]
    k = next(k for k in h if k.endswith("kernel"))
    assert h[k]["min"] == 0.0 and h[k]["max"] == 11.0
    assert sum(h[k]["counts"]) == 12
    assert events[1]["rows"] == [["zebra", 0.5]]
    assert events[2]["metadata"]["epoch"] == 3


def test_meter_sync_single_process_noop():
    from wildlifemapper_tpu.train.metrics import MetricLogger

    lg = MetricLogger(print_fn=lambda *a, **k: None)
    lg.update(loss=2.0)
    lg.update(loss=4.0)
    lg.synchronize_between_processes()  # process_count()==1: no-op
    assert lg.global_averages()["loss"] == 3.0


def test_meter_sync_merges_ragged_meters(monkeypatch):
    """Simulate a 2-process sync: partner contributes counts/totals for an
    overlapping-but-different meter set (the ragged case the reference's
    fixed-order all_reduce could not handle)."""
    import wildlifemapper_tpu.train.metrics as metrics_mod
    from wildlifemapper_tpu.train.metrics import MetricLogger

    lg = MetricLogger(print_fn=lambda *a, **k: None)
    lg.update(loss=2.0)
    lg.update(data_time=0.5)

    local = {k: (m.count, m.total) for k, m in lg.meters.items()}
    partner = {"loss": (3, 12.0), "eval_only": (1, 7.0)}

    import jax as _jax
    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    monkeypatch.setattr(_jax, "process_index", lambda: 0)
    import wildlifemapper_tpu.parallel.distributed as dist
    monkeypatch.setattr(dist, "all_gather_objects",
                        lambda obj: [local, partner])
    lg.synchronize_between_processes()
    avgs = lg.global_averages()
    assert avgs["loss"] == (2.0 + 12.0) / 4
    assert avgs["eval_only"] == 7.0
    assert avgs["data_time"] == 0.5
