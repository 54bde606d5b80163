"""Smoke tests for the visualization and orthomosaic CLIs — the reference's
visual-regression surface (visualize_prediction.py writes
prediction_plots/*.jpg). Tiny model injected by monkeypatching the CLIs'
config builder; the full main() flow runs end-to-end."""

import json

import numpy as np
import pytest
from PIL import Image

from tests.test_train_loop import REF_ANN, tiny_full_config


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_visualize_cli_writes_overlays(tmp_path, monkeypatch):
    from wildlifemapper_tpu.cli import visualize as viz

    monkeypatch.setattr(viz, "config_from_args",
                        lambda args: tiny_full_config())
    out = tmp_path / "plots"
    viz.main(["--output_dir", str(out), "--max_images", "2",
              "--score_threshold", "0.0"])  # random init: keep everything
    files = sorted(out.glob("*.jpg"))
    assert len(files) == 2
    img = Image.open(files[0])
    # the content region of the 64-canvas (resize_size=48, aspect kept)
    assert max(img.size) == 48 and min(img.size) >= 1

    # --draw_gt adds white GT outlines under the detections
    out_gt = out.parent / "plots_gt"
    viz.main(["--output_dir", str(out_gt), "--max_images", "1",
              "--score_threshold", "0.0", "--draw_gt"])
    arr = np.asarray(Image.open(sorted(out_gt.glob("*.jpg"))[0]))
    near_white = (arr > 235).all(axis=-1)
    assert near_white.any()


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_visualize_cli_orbax_checkpoint(tmp_path, monkeypatch):
    """--orbax_checkpoint restores trainer-saved params into the viz CLI
    (the run-of-record checkpoints are orbax, not torch)."""
    import jax

    from wildlifemapper_tpu.cli import visualize as viz
    from wildlifemapper_tpu.train.checkpoints import CheckpointManager
    from wildlifemapper_tpu.train.step import StepBuilder

    cfg = tiny_full_config()
    monkeypatch.setattr(viz, "config_from_args", lambda args: cfg)
    params = StepBuilder(cfg).init_params(jax.random.PRNGKey(3))
    CheckpointManager(str(tmp_path)).save("best_checkpoint", params)

    out = tmp_path / "plots"
    viz.main(["--output_dir", str(out), "--max_images", "1",
              "--score_threshold", "0.0",
              "--orbax_checkpoint", str(tmp_path / "best_checkpoint")])
    assert len(sorted(out.glob("*.jpg"))) == 1


def test_draw_detections_species_colors():
    from wildlifemapper_tpu.cli.visualize import SPECIES, draw_detections

    img = Image.new("RGB", (64, 64), (0, 0, 0))
    out = draw_detections(img, [[8, 8, 30, 30]], [2], [0.9], width=1)
    arr = np.asarray(out)
    # box outline painted in the Cattle color (visualize_prediction.py:82-91)
    assert tuple(arr[8, 20]) == SPECIES[2][1]
    assert tuple(np.asarray(img)[8, 20]) == (0, 0, 0)  # input untouched


def test_detect_mosaic_cli(tmp_path, monkeypatch):
    from wildlifemapper_tpu.cli import detect_mosaic as dm

    monkeypatch.setattr(dm, "config_from_args",
                        lambda args: tiny_full_config())
    rng = np.random.default_rng(0)
    mosaic = rng.integers(0, 255, (150, 200, 3), dtype=np.uint8)
    img_path = tmp_path / "mosaic.png"
    Image.fromarray(mosaic).save(img_path)
    out_json = tmp_path / "dets.json"
    dm.main(["--images", str(img_path), "--output", str(out_json),
             "--tile_batch", "2", "--overlap", "16",
             "--score_threshold", "0.0"])
    results = json.loads(out_json.read_text())
    r = results["mosaic.png"]
    assert set(r) == {"boxes", "scores", "labels"}
    assert len(r["boxes"]) == len(r["scores"]) == len(r["labels"])
    for b in r["boxes"]:  # mosaic coordinates, inside the image
        assert 0 <= b[0] <= 200 and 0 <= b[1] <= 150
