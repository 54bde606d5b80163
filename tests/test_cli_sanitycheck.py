"""Smoke + geometry tests for the data sanity-check CLI — the reference's
(disabled) GT-overlay loop at train.py:137-154, made runnable."""

import numpy as np
import pytest
from PIL import Image

from tests.test_train_loop import REF_ANN, tiny_full_config


@pytest.mark.skipif(not REF_ANN.exists(), reason="reference annotations absent")
def test_sanitycheck_cli_writes_overlays(tmp_path, monkeypatch):
    from wildlifemapper_tpu.cli import sanitycheck as sc

    monkeypatch.setattr(sc, "config_from_args",
                        lambda args: tiny_full_config())
    out = tmp_path / "data_sanitycheck.png"
    sc.main(["--output", str(out), "-n", "2"])
    second = tmp_path / "data_sanitycheck_1.png"
    assert out.exists() and second.exists()
    img = Image.open(out)
    # content region of the canvas (resize_size=48 in the tiny config;
    # the aspect-keeping resize may round the long side to 47)
    assert 46 <= max(img.size) <= 48 and min(img.size) >= 1


def test_render_sample_draws_gt_box_in_species_color():
    from wildlifemapper_tpu.cli.sanitycheck import render_sample
    from wildlifemapper_tpu.cli.visualize import SPECIES

    h, w = 40, 64
    example = {
        "image": np.zeros((64, 64, 3), np.uint8),  # canvas > content
        "size": np.asarray([h, w], np.int32),
        # one valid Cattle box (normalized cxcywh), one padded row
        "boxes": np.asarray([[0.5, 0.5, 0.5, 0.5], [0.1, 0.1, 0.05, 0.05]],
                            np.float32),
        "labels": np.asarray([2, 1], np.int64),
        "valid": np.asarray([True, False]),
    }
    img = render_sample(example, emit_uint8=True)
    arr = np.asarray(img)
    assert img.size == (w, h)  # content crop, not the canvas
    # box spans x 16..48, y 10..30 -> outline pixel on the top edge
    assert tuple(arr[10, 32]) == SPECIES[2][1]
    # the invalid row must not be drawn: its top edge (y=3, x=~6) stays black
    assert tuple(arr[3, 6]) == (0, 0, 0)
