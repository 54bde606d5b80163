"""CSV -> COCO converter parity tests.

Parity target: /root/reference/wildlifemapper/csv_to_coco.py. The oracle
test imports the reference script itself (pandas-based) and diffs full
outputs modulo the timestamped `info` block.
"""

import csv
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from wildlifemapper_tpu.data.csv_to_coco import (clamp_bbox,
                                                 convert_csv_to_coco,
                                                 detect_mode, point_to_bbox)

REF_SCRIPT = Path("/root/reference/wildlifemapper/csv_to_coco.py")


def _write_csv(path: Path, headers, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(headers)
        w.writerows(rows)


def _make_images(d: Path, sizes):
    d.mkdir(exist_ok=True)
    for name, (w, h) in sizes.items():
        Image.new("RGB", (w, h), (90, 120, 90)).save(d / name)


def test_point_to_bbox_reference_semantics():
    # integer half (csv_to_coco.py:42): 11 // 2 == 5, NOT 5.5
    assert point_to_bbox(20.0, 30.0, 11) == [15.0, 25.0, 11.0, 11.0]
    # clamp at creation (:43-44): near-origin points pin to 0, size stays
    assert point_to_bbox(2.0, 1.0, 10) == [0.0, 0.0, 10.0, 10.0]


def test_clamp_bbox_reference_semantics():
    # origin clamps to dim-1 and extent has a 1-px floor (:163-167)
    assert clamp_bbox([150.0, 10.0, 10.0, 10.0], 100, 100) == \
        [99.0, 10.0, 1.0, 10.0]
    # degenerate boxes get the 1-px floor, not 0
    assert clamp_bbox([5.0, 5.0, 0.0, -3.0], 100, 100) == \
        [5.0, 5.0, 1.0, 1.0]


def test_detect_mode_exact_sets():
    assert detect_mode(["images", "x", "y", "labels"])[0] == "point"
    m, cols = detect_mode(["images", "x_min", "y_min", "x_max", "y_max",
                           "labels"])
    assert m == "bbox" and cols == ("x_min", "y_min", "x_max", "y_max")
    m, cols = detect_mode(["images", "x1", "y1", "x2", "y2", "labels"])
    assert m == "bbox" and cols == ("x1", "y1", "x2", "y2")
    with pytest.raises(ValueError, match="Invalid CSV headers"):
        detect_mode(["images", "x", "y", "labels", "extra"])  # exact match


def test_point_conversion(tmp_path):
    imgs = tmp_path / "imgs"
    _make_images(imgs, {"a.jpg": (100, 80)})
    csv_file = tmp_path / "pts.csv"
    _write_csv(csv_file, ["images", "x", "y", "labels"],
               [["a.jpg", 50, 40, 2], ["a.jpg", 98, 3, 5]])
    coco = convert_csv_to_coco(str(csv_file), str(imgs),
                               str(tmp_path / "out.json"))
    assert [c["id"] for c in coco["categories"]] == [2, 5]
    a0, a1 = coco["annotations"]
    assert a0["bbox"] == [45.0, 35.0, 10.0, 10.0]
    assert a0["area"] == 100.0
    # 2nd point: x pinned by creation-clamp then bounds-clamp; area pre-clamp
    assert a1["bbox"] == [93.0, 0.0, 7.0, 10.0]
    assert a1["area"] == 100.0


def test_bbox_headers_and_aliases_identical(tmp_path):
    imgs = tmp_path / "imgs"
    _make_images(imgs, {"a.jpg": (100, 80)})
    rows = [["a.jpg", 10.5, 20.0, 40.0, 60.0, 1],
            ["a.jpg", 90.0, 70.0, 120.0, 95.0, 3]]  # overflows the image
    ref_csv = tmp_path / "ref.csv"
    alias_csv = tmp_path / "alias.csv"
    _write_csv(ref_csv, ["images", "x_min", "y_min", "x_max", "y_max",
                         "labels"], rows)
    _write_csv(alias_csv, ["images", "x1", "y1", "x2", "y2", "labels"], rows)
    c1 = convert_csv_to_coco(str(ref_csv), str(imgs),
                             str(tmp_path / "o1.json"))
    c2 = convert_csv_to_coco(str(alias_csv), str(imgs),
                             str(tmp_path / "o2.json"))
    assert c1["annotations"] == c2["annotations"]
    assert c1["annotations"][0]["bbox"] == [10.5, 20.0, 29.5, 40.0]
    # clamped to bounds, but area keeps the pre-clamp extent (:161)
    assert c1["annotations"][1]["bbox"] == [90.0, 70.0, 10.0, 10.0]
    assert c1["annotations"][1]["area"] == pytest.approx(30.0 * 25.0)


def test_sorted_image_order_and_skip(tmp_path, capsys):
    """Image ids follow sorted filename order (pandas groupby sorts keys,
    reference :107); unreadable images are skipped but their labels still
    reach `categories` (:110-119)."""
    imgs = tmp_path / "imgs"
    _make_images(imgs, {"b.jpg": (64, 64), "a.jpg": (32, 32)})
    csv_file = tmp_path / "pts.csv"
    _write_csv(csv_file, ["images", "x", "y", "labels"],
               [["b.jpg", 5, 5, 1], ["a.jpg", 5, 5, 2],
                ["missing.jpg", 5, 5, 7]])
    coco = convert_csv_to_coco(str(csv_file), str(imgs),
                               str(tmp_path / "out.json"))
    assert [i["file_name"] for i in coco["images"]] == ["a.jpg", "b.jpg"]
    assert [i["id"] for i in coco["images"]] == [1, 2]
    assert [c["id"] for c in coco["categories"]] == [1, 2, 7]
    assert len(coco["annotations"]) == 2
    assert "Skipping missing.jpg" in capsys.readouterr().out


def test_default_size_substitutes(tmp_path):
    csv_file = tmp_path / "pts.csv"
    _write_csv(csv_file, ["images", "x", "y", "labels"],
               [["ghost.jpg", 10, 10, 1]])
    coco = convert_csv_to_coco(str(csv_file), str(tmp_path / "none"),
                               str(tmp_path / "out.json"),
                               default_size=(640, 480))
    assert coco["images"][0]["width"] == 640
    assert len(coco["annotations"]) == 1


def test_half_specified_default_size_rejected(tmp_path):
    """--default_width without --default_height (or vice versa) must be a
    CLI error: a (w, None) size crashes later in clamp on the first
    unprobeable image, and height-only was silently ignored."""
    from wildlifemapper_tpu.data.csv_to_coco import main

    csv_file = tmp_path / "pts.csv"
    _write_csv(csv_file, ["images", "x", "y", "labels"],
               [["ghost.jpg", 10, 10, 1]])
    base = ["--csv_file", str(csv_file), "--images_dir",
            str(tmp_path / "none"), "--output_json", str(tmp_path / "o.json")]
    for half in (["--default_width", "640"], ["--default_height", "480"]):
        with pytest.raises(SystemExit):
            main(base + half)


def _approx_equal(a, b, path=""):
    """Structural equality with ULP-level float tolerance: pandas' default
    xstrtod CSV float parser (used by the reference) is not correctly
    rounded, so coordinates can differ from Python's float() by a few ULPs.
    Everything else must match exactly."""
    if isinstance(a, dict) and isinstance(b, dict):
        assert a.keys() == b.keys(), path
        for k in a:
            _approx_equal(a[k], b[k], f"{path}.{k}")
    elif isinstance(a, list) and isinstance(b, list):
        assert len(a) == len(b), path
        for i, (x, y) in enumerate(zip(a, b)):
            _approx_equal(x, y, f"{path}[{i}]")
    elif isinstance(a, float) or isinstance(b, float):
        assert a == pytest.approx(b, rel=1e-12, abs=1e-9), path
    else:
        assert a == b, path


@pytest.mark.skipif(not REF_SCRIPT.exists(), reason="reference absent")
def test_oracle_parity_with_reference(tmp_path):
    """Full-output diff vs the reference converter (modulo the timestamped
    `info` block)."""
    pd = pytest.importorskip("pandas")  # noqa: F841 — reference needs it
    import importlib.util

    spec = importlib.util.spec_from_file_location("ref_csv2coco", REF_SCRIPT)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    imgs = tmp_path / "imgs"
    _make_images(imgs, {"z.jpg": (120, 90), "a.jpg": (77, 131),
                        "m.jpg": (64, 64)})
    rng = np.random.default_rng(7)

    # points — including out-of-bounds and near-edge ones
    pt_rows = []
    for i in range(40):
        name = ["z.jpg", "a.jpg", "m.jpg", "gone.jpg"][int(rng.integers(4))]
        pt_rows.append([name, float(rng.uniform(-5, 140)),
                        float(rng.uniform(-5, 140)), int(rng.integers(1, 6))])
    pt_csv = tmp_path / "pts.csv"
    _write_csv(pt_csv, ["images", "x", "y", "labels"], pt_rows)

    ours = convert_csv_to_coco(str(pt_csv), str(imgs),
                               str(tmp_path / "ours.json"), box_size=11)
    ref.convert_csv_to_coco(str(pt_csv), str(imgs),
                            str(tmp_path / "ref.json"), bbox_size=11)
    theirs = json.loads((tmp_path / "ref.json").read_text())
    for k in ("images", "annotations", "categories", "licenses"):
        _approx_equal(ours[k], theirs[k], k)

    # bboxes — reference headers
    bx_rows = []
    for i in range(30):
        name = ["z.jpg", "a.jpg", "m.jpg"][int(rng.integers(3))]
        x0, y0 = rng.uniform(-10, 100, 2)
        bx_rows.append([name, float(x0), float(y0),
                        float(x0 + rng.uniform(0, 80)),
                        float(y0 + rng.uniform(0, 80)),
                        int(rng.integers(1, 6))])
    bx_csv = tmp_path / "boxes.csv"
    _write_csv(bx_csv, ["images", "x_min", "y_min", "x_max", "y_max",
                        "labels"], bx_rows)
    ours = convert_csv_to_coco(str(bx_csv), str(imgs),
                               str(tmp_path / "ours2.json"))
    ref.convert_csv_to_coco(str(bx_csv), str(imgs),
                            str(tmp_path / "ref2.json"))
    theirs = json.loads((tmp_path / "ref2.json").read_text())
    for k in ("images", "annotations", "categories", "licenses"):
        _approx_equal(ours[k], theirs[k], k)

    # non-integer labels: pandas float column -> category names keep the
    # float repr ('class_2.0' / 'class_2.5') and ids int-coerce (both 2 —
    # the reference's own duplicate-id quirk, csv_to_coco.py:114-119)
    fl_csv = tmp_path / "float_labels.csv"
    _write_csv(fl_csv, ["images", "x", "y", "labels"],
               [["m.jpg", 10, 10, 2.0], ["m.jpg", 30, 30, 2.5]])
    ours = convert_csv_to_coco(str(fl_csv), str(imgs),
                               str(tmp_path / "ours3.json"))
    ref.convert_csv_to_coco(str(fl_csv), str(imgs),
                            str(tmp_path / "ref3.json"))
    theirs = json.loads((tmp_path / "ref3.json").read_text())
    for k in ("images", "annotations", "categories"):
        _approx_equal(ours[k], theirs[k], k)
    assert [c["name"] for c in ours["categories"]] == \
        ["class_2.0", "class_2.5"]
