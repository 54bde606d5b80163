"""HerdNet CSV -> COCO JSON converter.

Behavioral parity target: wildlifemapper/csv_to_coco.py — accepts point
CSVs (`images,x,y,labels`) or bbox CSVs (`images,x1,y1,x2,y2,labels`),
converts points to fixed-size boxes (default 10 px, :32-47), probes image
sizes with PIL (:22-29), clamps boxes to image bounds (:163-167), writes
{images, annotations, categories} (:184-194). stdlib csv instead of pandas.
"""

from __future__ import annotations

import csv
import json
from collections import OrderedDict
from pathlib import Path
from typing import Dict, Optional

from PIL import Image

POINT_HEADERS = {"images", "x", "y", "labels"}
BBOX_HEADERS = {"images", "x1", "y1", "x2", "y2", "labels"}


def point_to_bbox(x: float, y: float, box_size: int = 10):
    """Center a fixed-size box on an annotation point (csv_to_coco.py:32-47)."""
    half = box_size / 2.0
    return [x - half, y - half, float(box_size), float(box_size)]


def probe_image_size(path: Path):
    with Image.open(path) as im:
        return im.size  # (w, h)


def convert_csv_to_coco(csv_file: str, images_dir: str, output_json: str,
                        box_size: int = 10,
                        default_size: Optional[tuple] = None) -> dict:
    rows = list(csv.DictReader(open(csv_file)))
    if not rows:
        raise ValueError(f"empty csv {csv_file}")
    headers = set(rows[0].keys())
    if POINT_HEADERS.issubset(headers):
        mode = "point"
    elif BBOX_HEADERS.issubset(headers):
        mode = "bbox"
    else:
        raise ValueError(f"unrecognized csv headers {sorted(headers)}; need "
                         f"{sorted(POINT_HEADERS)} or {sorted(BBOX_HEADERS)}")

    images: "OrderedDict[str, dict]" = OrderedDict()
    annotations = []
    cat_ids = set()
    img_dir = Path(images_dir)

    for row in rows:
        fname = row["images"]
        if fname not in images:
            path = img_dir / fname
            if path.exists():
                w, h = probe_image_size(path)
            elif default_size:
                w, h = default_size
            else:
                raise FileNotFoundError(
                    f"{path} missing; pass default_size to skip probing")
            images[fname] = {
                "id": len(images) + 1, "width": w, "height": h,
                "file_name": fname, "license": 1, "flickr_url": "",
                "coco_url": "", "date_captured": "",
            }
        info = images[fname]
        w, h = info["width"], info["height"]

        if mode == "point":
            bbox = point_to_bbox(float(row["x"]), float(row["y"]), box_size)
        else:
            x1, y1 = float(row["x1"]), float(row["y1"])
            x2, y2 = float(row["x2"]), float(row["y2"])
            bbox = [x1, y1, x2 - x1, y2 - y1]
        # clamp to image bounds (csv_to_coco.py:163-167)
        x0 = max(0.0, min(bbox[0], w))
        y0 = max(0.0, min(bbox[1], h))
        bw = max(0.0, min(bbox[2], w - x0))
        bh = max(0.0, min(bbox[3], h - y0))
        cat = int(float(row["labels"]))
        cat_ids.add(cat)
        annotations.append({
            "id": len(annotations) + 1,
            "image_id": info["id"],
            "category_id": cat,
            "bbox": [x0, y0, bw, bh],
            "area": bw * bh,
            "segmentation": [],
            "iscrowd": 0,
        })

    coco = {
        "images": list(images.values()),
        "annotations": annotations,
        "categories": [{"id": c, "name": f"class_{c}",
                        "supercategory": "animal"}
                       for c in sorted(cat_ids)],
    }
    Path(output_json).parent.mkdir(parents=True, exist_ok=True)
    with open(output_json, "w") as f:
        json.dump(coco, f)
    return coco


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--csv_file", required=True)
    p.add_argument("--images_dir", required=True)
    p.add_argument("--output_json", required=True)
    p.add_argument("--box_size", type=int, default=10)
    p.add_argument("--default_width", type=int, default=None)
    p.add_argument("--default_height", type=int, default=None)
    args = p.parse_args(argv)
    default_size = ((args.default_width, args.default_height)
                    if args.default_width else None)
    coco = convert_csv_to_coco(args.csv_file, args.images_dir,
                               args.output_json, args.box_size, default_size)
    print(f"wrote {len(coco['images'])} images / "
          f"{len(coco['annotations'])} annotations to {args.output_json}")


if __name__ == "__main__":
    main()
