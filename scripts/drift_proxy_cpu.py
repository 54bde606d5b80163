"""Scaled CPU proxy of the trained-weights crop-drift measurement.

The north-star conjunction needs drift-as-mAP between the full-canvas
function and the checkpoint-compat crop tier measured with TRAINED
weights (random-init drift 0.650 is a worst-case bound — PERF.md). The
real measurement runs at 1024px on the TPU (scripts/conjunction.py,
queued behind the relay watchdog); this proxy reproduces the experiment
end-to-end on the 1-core CPU host at 1/16 the pixels so the question
("does a model trained on zero-padded canvases learn to ignore the pad
tokens the crop tier drops?") gets a measured answer even with the chip
unreachable:

  * same geometry ratio: 192px content in a 256px canvas (vs 768-in-1024),
    16x16 token grid cropped to 12x12 — the pad fraction the crop drops
    is identical (44%);
  * same training recipe: synthetic ellipse tiles from the real val/train
    annotation geometry, AdamW + StepLR, clip 1.0, encoder trained;
  * same measurement: f32 full-canvas detections as pseudo-GT, each tier
    scored with the repo COCOeval (scripts/drift_map.py methodology).

Writes checkpoints under --work_dir and prints per-tier drift AP lines
plus one JSON verdict line.
"""
import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

import jax
jax.config.update("jax_platforms", "cpu")  # axon hangs when the relay is down

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wildlifemapper_tpu.config import (Config, DataConfig, DecoderConfig,  # noqa: E402
                                       HFCConfig, MatchCriterionConfig,
                                       TrainConfig, ViTConfig, model_config)


def proxy_model_config(dtype="float32", content_size=None,
                       use_flash=False, aux_loss=False):
    base = model_config("vit_b", dtype=dtype, use_flash_attention=use_flash,
                        content_size=content_size)
    return dataclasses.replace(
        base, img_size=256, patch_size=16,
        vit=ViTConfig(embed_dim=192, depth=6, num_heads=6,
                      global_attn_indexes=(2, 5), window_size=4,
                      out_chans=128),
        # ffn_dim must equal proj_dim (the adaptor's FFN residual adds the
        # proj_dim stream; reference uses 1024 for both)
        hfc=HFCConfig(embed_dim=96, proj_dim=96, num_heads=4, ffn_dim=96),
        decoder=DecoderConfig(transformer_dim=128, mlp_dim=256,
                              num_queries=51, num_heads=4,
                              aux_loss=aux_loss))


# Scaled-box annotation sets live under /tmp/prof/proxy_ann{factor}[_n{N}].
#
# Why scaled boxes: the bundled geometry is ~49 px animals on 5472 px
# frames — ~7 px after the DETR resize at FULL scale (768 content), i.e.
# sub-patch at patch 16. The reference only ever localizes these on top of
# SAM-pretrained features (unreachable here: egress blocked); training
# from scratch plateaus at GIoU <= 0 on them (measured: loss_giou flat at
# ~1.39 over 20 epochs, and even a 600-step overfit stops at ~0.94).
# `--box_scale` sets the object-to-patch ratio of the proxy: 4x matches
# the reference's true (sub-patch) ratio, 16x gives ~1.7 patches per
# animal — the convergence-feasible benchmark config for the from-scratch
# integration + parity runs. The drift methodology is unchanged — the
# synthetic renderer draws whatever geometry the annotations carry.
PROXY_ANN_ROOT = "/tmp/prof/proxy_ann"


def proxy_ann_dir(factor, n_train=None):
    if factor == 4.0 and n_train is None:
        return PROXY_ANN_ROOT  # round-3 layout, keeps old runs resumable
    tag = f"{factor:g}" + (f"_n{n_train}" if n_train else "")
    return f"{PROXY_ANN_ROOT}{tag}"


def proxy_data_config(ann_dir=PROXY_ANN_ROOT):
    import os
    coco = ann_dir if os.path.exists(f"{ann_dir}/train.json") \
        else DataConfig.coco_path
    return DataConfig(coco_path=coco, synthetic=True, synthetic_size=256,
                      resize_size=192, canvas_size=256, batch_size=8,
                      flip_prob=0.5, num_workers=0)


def build_scaled_annotations(src_dir, out_dir=PROXY_ANN_ROOT, factor=4.0,
                             n_train=None):
    """Derive the proxy annotation set: boxes scaled `factor`x around their
    centers (capped at 30% of the image side, clamped in-bounds). With
    `n_train`, the train split keeps only its first n images (fast
    convergence runs); val is never subset."""
    import json
    import os

    from wildlifemapper_tpu.data.coco import load_ann_json
    os.makedirs(out_dir, exist_ok=True)
    for split in ("train", "val"):
        # load_ann_json, not open(): the standalone package resolves these
        # to the gzipped vendored bundle (assets/coco_annotations/*.json.gz)
        d = load_ann_json(f"{src_dir}/{split}.json")
        if split == "train" and n_train:
            d["images"] = d["images"][:n_train]
            keep = {im["id"] for im in d["images"]}
            d["annotations"] = [a for a in d["annotations"]
                                if a["image_id"] in keep]
        dims = {im["id"]: (im["width"], im["height"]) for im in d["images"]}
        for a in d["annotations"]:
            x, y, w, h = a["bbox"]
            cx, cy = x + w / 2, y + h / 2
            iw, ih = dims[a["image_id"]]
            w2, h2 = min(w * factor, iw * 0.3), min(h * factor, ih * 0.3)
            x2 = min(max(cx - w2 / 2, 0), iw - w2)
            y2 = min(max(cy - h2 / 2, 0), ih - h2)
            a["bbox"] = [x2, y2, w2, h2]
            a["area"] = w2 * h2
        json.dump(d, open(f"{out_dir}/{split}.json", "w"))


def train_proxy(workdir, epochs, eval_every, resume, ann_dir=PROXY_ANN_ROOT,
                aux_loss=False, lr_drop=40):
    from wildlifemapper_tpu.train.loop import train

    cfg = Config(model=proxy_model_config("bfloat16", aux_loss=aux_loss),
                 data=proxy_data_config(ann_dir),
                 train=TrainConfig(lr=1e-4, epochs=epochs, lr_drop=lr_drop,
                                   clip_max_norm=1.0, use_amp=True,
                                   freeze_encoder=False,
                                   eval_every=eval_every,
                                   checkpoint_every=10),
                 criterion=MatchCriterionConfig())
    t0 = time.time()
    stats = train(cfg, workdir=workdir, resume=resume)
    print(f"training done in {time.time()-t0:.0f}s; final stats:")
    for k, v in sorted(stats.items()):
        print(f"  {k}: {v:.4f}")
    return stats


def val_tiles(n, ann_dir=PROXY_ANN_ROOT):
    from wildlifemapper_tpu.data.loader import build_dataset

    dc = dataclasses.replace(proxy_data_config(ann_dir), flip_prob=0.0)
    ds = build_dataset("val", dc)
    n = min(n, len(ds))
    return np.stack([ds.get(i)["image"] for i in range(n)]).astype(np.float32)


def eval_ap_vs_gt(mc, params, ann_dir):
    """Val-split AP against the real (scaled) annotations for one tier —
    the conjunction's metric of record (crop/full AP ratio), complementing
    the stricter detections-vs-detections drift below."""
    from wildlifemapper_tpu.data.loader import DataLoader, build_dataset
    from wildlifemapper_tpu.eval.evaluate import evaluate
    from wildlifemapper_tpu.train.step import StepBuilder

    dc = dataclasses.replace(proxy_data_config(ann_dir), flip_prob=0.0)
    cfg = Config(model=mc, data=dc,
                 train=TrainConfig(use_amp=mc.dtype == "bfloat16"))
    ds = build_dataset("val", dc)
    loader = DataLoader(ds, dc.batch_size, shuffle=False, drop_last=False)
    stats = evaluate(StepBuilder(cfg).jit_eval_step(), params, loader,
                     ds.index, cfg, print_fn=lambda *a, **k: None)
    return stats["coco/AP"], stats["coco/AP50"]


def run_tier(cfg, params, tiles, batch=8):
    from wildlifemapper_tpu.eval.drift import run_detections
    return run_detections(cfg, params, tiles, batch=batch)


def drift_ap(gt_dets, pred_dets, n, gt_thresh=0.3):
    from wildlifemapper_tpu.eval.drift import drift_summary
    return drift_summary(gt_dets, pred_dets, n, gt_thresh=gt_thresh)["AP"]


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work_dir", default="/tmp/prof/proxy_train")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--eval_every", type=int, default=10)
    ap.add_argument("--n_imgs", type=int, default=64)
    ap.add_argument("--box_scale", type=float, default=4.0,
                    help="annotation box scale factor: 4 = the reference's "
                         "true sub-patch ratio, 16 = ~1.7 patches/animal "
                         "(convergence-feasible)")
    ap.add_argument("--n_train", type=int, default=None,
                    help="subset the train split to its first N images")
    ap.add_argument("--aux_loss", action="store_true",
                    help="deep supervision on the intermediate decoder layer")
    ap.add_argument("--lr_drop", type=int, default=40)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--skip_train", action="store_true",
                    help="measure drift on an existing work_dir checkpoint")
    ap.add_argument("--checkpoint_trend", default=None,
                    help="comma-separated epoch numbers: instead of the "
                         "single best-checkpoint verdict, measure the "
                         "crop/full parity ratio + drift at each "
                         "checkpoint_epoch_N in work_dir — the trend over "
                         "training is the mechanism evidence (pad-token "
                         "contribution -> 0 as the model converges)")
    args = ap.parse_args()

    import os
    ann_dir = proxy_ann_dir(args.box_scale, args.n_train)
    if not os.path.exists(f"{ann_dir}/train.json"):
        from wildlifemapper_tpu.data.coco import resolve_ann_file
        src = os.path.dirname(resolve_ann_file(
            DataConfig.coco_path + "/train.json"))
        build_scaled_annotations(src, ann_dir, args.box_scale, args.n_train)

    if not args.skip_train:
        train_proxy(args.work_dir, args.epochs, args.eval_every, args.resume,
                    ann_dir=ann_dir, aux_loss=args.aux_loss,
                    lr_drop=args.lr_drop)

    from wildlifemapper_tpu.models import WildlifeMapper
    from wildlifemapper_tpu.train.checkpoints import CheckpointManager

    cfg32 = proxy_model_config("float32")
    m32 = WildlifeMapper(cfg32)
    init32 = jax.jit(m32.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 256, 3)))

    if args.checkpoint_trend:
        cfg_crop = proxy_model_config("bfloat16", content_size=192)
        cfg_full = proxy_model_config("bfloat16")
        tiles = val_tiles(args.n_imgs, ann_dir)
        rows = []
        for ep in (int(e) for e in args.checkpoint_trend.split(",")):
            p = CheckpointManager.load_params(
                f"{args.work_dir}/checkpoint_epoch_{ep}", init32)
            gt = run_tier(cfg32, p, tiles)
            crop_dets = run_tier(cfg_crop, p, tiles)
            drift = drift_ap(gt, crop_dets, len(tiles))
            drift05 = drift_ap(gt, crop_dets, len(tiles), gt_thresh=0.5)
            full_ap = eval_ap_vs_gt(cfg_full, p, ann_dir)
            crop_ap = eval_ap_vs_gt(cfg_crop, p, ann_dir)
            ratio = crop_ap[0] / full_ap[0] if full_ap[0] > 0 else float("nan")
            r50 = crop_ap[1] / full_ap[1] if full_ap[1] > 0 else float("nan")
            rows.append({"epoch": ep, "crop_drift_ap": drift,
                         "crop_drift_serve05": drift05,
                         "full_ap": full_ap[0], "crop_ap": crop_ap[0],
                         "parity_ratio": ratio, "parity_ratio_ap50": r50})
            print(f"epoch {ep}: crop-drift={drift:.4f} "
                  f"(@serve0.5 {drift05:.4f}) "
                  f"full-AP={full_ap[0]:.4f} crop-AP={crop_ap[0]:.4f} "
                  f"ratio={ratio:.4f} ratio@50={r50:.4f}", flush=True)
        print(json.dumps({"experiment": "cpu_proxy_parity_trend",
                          "rows": rows}))
        return

    params = CheckpointManager.load_params(
        f"{args.work_dir}/best_checkpoint", init32)
    print("loaded trained proxy params", flush=True)

    tiles = val_tiles(args.n_imgs, ann_dir)
    n = len(tiles)
    gt = run_tier(cfg32, params, tiles)
    print(f"pseudo-GT detections: {int((gt['scores'] > 0.3).sum())}",
          flush=True)

    tiers = [("f32-self", cfg32),
             ("bf16-full", proxy_model_config("bfloat16")),
             ("bf16-crop", proxy_model_config("bfloat16",
                                              content_size=192))]
    results, results_serve = {}, {}
    for tag, cfg in tiers:
        dets = run_tier(cfg, params, tiles)
        results[tag] = drift_ap(gt, dets, n)
        # Serving-threshold pseudo-GT (0.5, visualize_prediction.py:150) —
        # same rows drift_map.py reports, methodology shared via eval/drift.
        results_serve[tag] = drift_ap(gt, dets, n, gt_thresh=0.5)
        print(f"{tag}: drift-AP={results[tag]:.4f} "
              f"(@serve0.5 {results_serve[tag]:.4f})", flush=True)

    # AP against the real (scaled) annotations, per tier — the parity
    # metric of record; its crop/full ratio is the conjunction gate.
    ap_gt = {}
    for tag, cfg in tiers:
        ap_gt[tag] = eval_ap_vs_gt(cfg, params, ann_dir)
        print(f"{tag}: AP-vs-GT={ap_gt[tag][0]:.4f} "
              f"AP50={ap_gt[tag][1]:.4f}", flush=True)
    full_ap, crop_ap = ap_gt["bf16-full"][0], ap_gt["bf16-crop"][0]
    ratio = crop_ap / full_ap if full_ap > 0 else float("nan")
    print(f"crop/full AP-vs-GT parity ratio: {ratio:.4f}", flush=True)

    # Random-init contrast on the same proxy (the worst-case bound)
    rand = jax.jit(m32.init)(jax.random.PRNGKey(7),
                             jnp.zeros((1, 256, 256, 3)))
    gt_r = run_tier(cfg32, rand, tiles)
    crop_r = run_tier(proxy_model_config("bfloat16", content_size=192),
                      rand, tiles)
    rand_drift = drift_ap(gt_r, crop_r, n)
    print(f"random-init bf16-crop contrast: drift-AP={rand_drift:.4f}",
          flush=True)

    print(json.dumps({
        "experiment": "cpu_proxy_trained_weights_crop_drift",
        "geometry": "192-content in 256-canvas (1/16 px of 768-in-1024)",
        "trained": results, "trained_serve05": results_serve,
        "random_init_crop": rand_drift,
        "ap_vs_gt": {k: list(v) for k, v in ap_gt.items()},
        "map_parity_ratio": ratio,
    }))


if __name__ == "__main__":
    main()
