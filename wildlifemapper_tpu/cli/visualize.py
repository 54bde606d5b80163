"""Prediction visualization CLI.

Behavioral parity target: visualize_prediction.py — run the val loader
through a trained model, keep detections with score > 0.5, apply NMS at IoU
0.4 (:150-157), draw per-species colored boxes (:82-133) and write
prediction_plots/<image_id>.jpg. Drawing uses PIL (cv2 is not in this
image).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np
from PIL import Image, ImageDraw

from .train import add_config_args, config_from_args

# Species map (visualize_prediction.py:82-91). BGR there; RGB here.
SPECIES = {
    1: ("Shoats", (255, 0, 0)),
    2: ("Cattle", (0, 255, 0)),
    3: ("Impala", (0, 0, 255)),
    4: ("Zebra", (255, 255, 0)),
    5: ("Wildebeest", (255, 0, 255)),
    6: ("Buffalo", (0, 255, 255)),
    7: ("Topi", (128, 0, 128)),
    8: ("Other", (255, 165, 0)),
}


def draw_detections(image: Image.Image, boxes, labels, scores,
                    width: int = 2) -> Image.Image:
    img = image.convert("RGB").copy()
    d = ImageDraw.Draw(img)
    for (x0, y0, x1, y1), lbl, sc in zip(boxes, labels, scores):
        name, color = SPECIES.get(int(lbl), ("Other", (255, 165, 0)))
        d.rectangle([x0, y0, x1, y1], outline=color, width=width)
        d.text((x0, max(y0 - 10, 0)), f"{name} {sc:.2f}", fill=color)
    return img


def main(argv=None):
    p = add_config_args(argparse.ArgumentParser(__doc__))
    p.add_argument("--split", default="val")
    p.add_argument("--output_dir", default="prediction_plots")
    p.add_argument("--score_threshold", type=float, default=0.5)
    p.add_argument("--nms_iou", type=float, default=0.4)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--orbax_checkpoint", default=None,
                   help="orbax checkpoint dir saved by our trainer "
                        "(the torch --checkpoint path also works)")
    p.add_argument("--use_ema", action="store_true",
                   help="visualize the EMA weights from an orbax checkpoint")
    p.add_argument("--config_json", default=None,
                   help="config.json written by the trainer beside its "
                        "checkpoints; overrides the flag-derived model "
                        "config (see cli/evaluate)")
    p.add_argument("--draw_gt", action="store_true",
                   help="also draw the ground-truth boxes (thin white) "
                        "under the detections — qualitative eval at a "
                        "glance")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    if args.config_json:
        import dataclasses

        from ..config import config_from_json
        saved = config_from_json(open(args.config_json).read())
        cfg = dataclasses.replace(cfg, model=saved.model,
                                  criterion=saved.criterion)

    import jax

    from ..data.loader import DataLoader, build_dataset
    from ..eval.postprocess import batched_nms, postprocess
    from ..train.step import StepBuilder

    ds = build_dataset(args.split, cfg.data)
    loader = DataLoader(ds, 1, shuffle=False, drop_last=False)
    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(0))
    if args.checkpoint:
        from ..compat.torch_convert import convert_checkpoint
        params, _ = convert_checkpoint(args.checkpoint, params,
                                       depth=cfg.model.vit.depth)
    elif args.orbax_checkpoint:
        from ..train.checkpoints import CheckpointManager
        params = CheckpointManager.load_params(args.orbax_checkpoint,
                                               params, use_ema=args.use_ema)

    model = builder.model
    fwd = jax.jit(lambda p, x: model.apply(p, x))
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    n = 0
    for batch in loader.epoch(0):
        out = fwd(params, batch["image"])
        # visualization scales boxes to the post-resize content size
        # (visualize_prediction.py feeds `size`, not orig_size)
        dets = postprocess(out, batch["size"], args.score_threshold,
                           cfg.eval.hw_swap_compat)
        dets["keep"] = batched_nms(dets["boxes"], dets["scores"],
                                   dets["labels"], dets["keep"],
                                   args.nms_iou, class_aware=False)
        dets = jax.device_get(dets)
        keep = np.asarray(dets["keep"][0])
        # render the (denormalized) content region of the canvas
        h, w = (int(batch["size"][0][0]), int(batch["size"][0][1]))
        from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD
        arr = batch["image"][0][:h, :w]
        arr = ((arr * IMAGENET_STD + IMAGENET_MEAN) * 255).clip(0, 255)
        img = Image.fromarray(arr.astype(np.uint8))
        if args.draw_gt and "boxes" in batch:
            d = ImageDraw.Draw(img)
            for (cx, cy, bw, bh), ok in zip(
                    np.asarray(batch["boxes"][0]),
                    np.asarray(batch["valid"][0])):
                if not ok:
                    continue
                d.rectangle([(cx - bw / 2) * w, (cy - bh / 2) * h,
                             (cx + bw / 2) * w, (cy + bh / 2) * h],
                            outline=(255, 255, 255), width=1)
        img = draw_detections(img, dets["boxes"][0][keep],
                              dets["labels"][0][keep],
                              dets["scores"][0][keep])
        img_id = int(batch["image_id"][0])
        img.save(out_dir / f"{img_id}.jpg")
        n += 1
        if args.max_images and n >= args.max_images:
            break
    print(f"wrote {n} visualizations to {out_dir}")


if __name__ == "__main__":
    main()
