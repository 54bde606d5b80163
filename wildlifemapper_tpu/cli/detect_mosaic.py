"""Orthomosaic detection CLI: run the sliding-window detector over one or
more large aerial images (BASELINE config 4: streaming orthomosaic).

Usage:
  python -m wildlifemapper_tpu.cli.detect_mosaic --images a.jpg b.tif \
      --checkpoint best_checkpoint.pth --output detections.json
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image

from .train import add_config_args, config_from_args

Image.MAX_IMAGE_PIXELS = None  # orthomosaics exceed PIL's decompression cap


def main(argv=None):
    p = add_config_args(argparse.ArgumentParser(__doc__))
    p.add_argument("--images", nargs="+", required=True)
    p.add_argument("--output", default="mosaic_detections.json")
    p.add_argument("--tile_batch", type=int, default=4)
    p.add_argument("--overlap", type=int, default=256)
    p.add_argument("--score_threshold", type=float, default=0.5)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    import jax

    from ..eval.orthomosaic import OrthomosaicDetector
    from ..train.step import StepBuilder

    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        from ..compat.torch_convert import convert_checkpoint
        params, _ = convert_checkpoint(args.checkpoint, params,
                                       depth=cfg.model.vit.depth)

    # Multi-chip hosts shard tile batches over the mesh's data axis (the
    # pod-scale mosaic path); single-chip runs stay mesh-free.
    mesh = None
    if len(jax.devices()) > 1:
        from ..parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh(model_parallel=1)
    det = OrthomosaicDetector(builder.model, params, cfg.model,
                              tile_batch=args.tile_batch,
                              overlap=args.overlap,
                              confidence_threshold=args.score_threshold,
                              nms_iou=cfg.eval.nms_iou, mesh=mesh)
    results = {}
    for path in args.images:
        img = np.asarray(Image.open(path).convert("RGB"))
        out = det.detect(img)
        results[Path(path).name] = {
            "boxes": out["boxes"].tolist(),
            "scores": out["scores"].tolist(),
            "labels": out["labels"].tolist(),
        }
        print(f"{path}: {len(out['boxes'])} detections over "
              f"{img.shape[1]}x{img.shape[0]} px")
    with open(args.output, "w") as f:
        json.dump(results, f)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
