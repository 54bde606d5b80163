"""Drift measured as mAP, not tensor distance (VERDICT weak #7).

f32 full-canvas detections (the bit-parity-vs-torch path) act as pseudo
ground truth; bf16+flash and bf16+crop detections are scored against them
with the repo's COCOeval on synthetic-but-structured imagery (dark ellipse
'animals' on a smooth background — unlike white noise, detections are
stable under small perturbations).
"""
import dataclasses
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

from wildlifemapper_tpu.config import model_config
from wildlifemapper_tpu.eval.drift import drift_summary, run_detections
from wildlifemapper_tpu.models import WildlifeMapper  # noqa: F401 — m32 init

N_IMGS = 16
B = 4


def synth_tiles(rng, n):
    tiles = np.zeros((n, 1024, 1024, 3), np.float32)
    yy, xx = np.mgrid[:768, :768]
    for i in range(n):
        bg = rng.normal(0.0, 0.05, size=(768, 768, 3)).astype(np.float32)
        bg += (np.sin(xx / 97.0 + i) * 0.3)[..., None]
        for _ in range(int(rng.integers(3, 12))):
            cy, cx = rng.uniform(40, 728, 2)
            ry, rx = rng.uniform(6, 24, 2)
            m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
            bg[m] = rng.uniform(-2.5, -1.5)
        tiles[i, :768, :768] = bg
    return tiles


def run(cfg, params, tiles):
    return run_detections(cfg, params, tiles, batch=B, img_size=1024)


def map_vs(gt_dets, pred_dets, gt_thresh=0.3):
    s = drift_summary(gt_dets, pred_dets, N_IMGS, gt_thresh=gt_thresh)
    return s["AP"], s["AP50"]


def loader_tiles(n, coco_path=None):
    """Val-split tiles rendered by the training loader itself (same
    synthetic distribution a trained checkpoint saw), preprocessed
    exactly as eval does (resize 768, normalize, 1024 canvas, no flip)."""
    from wildlifemapper_tpu.config import DataConfig
    from wildlifemapper_tpu.data.loader import build_dataset

    cfg = DataConfig(synthetic=True, flip_prob=0.0,
                     coco_path=coco_path or DataConfig.coco_path)
    ds = build_dataset("val", cfg)
    n = min(n, len(ds))
    exs = [ds.get(i) for i in range(n)]
    tiles = np.stack([e["image"] for e in exs])
    return tiles.astype(np.float32), n


def load_trained(path, params):
    """Pull the params subtree out of a trainer TrainState checkpoint."""
    from wildlifemapper_tpu.train.checkpoints import CheckpointManager
    return CheckpointManager.load_params(path, params)


def main():
    global N_IMGS
    import argparse
    ap_p = argparse.ArgumentParser(description=__doc__)
    ap_p.add_argument("--orbax_checkpoint", default=None,
                      help="trained TrainState dir; default: random init")
    ap_p.add_argument("--val_tiles", action="store_true",
                      help="use loader-rendered val-split tiles instead of "
                           "the script's own synthetic field")
    ap_p.add_argument("--n_imgs", type=int, default=N_IMGS)
    ap_p.add_argument("--coco_path", default=None,
                      help="annotation dir for --val_tiles (use the set the "
                           "checkpoint was trained on, e.g. a scaled-box "
                           "set from scripts/build_scaled_ann.py)")
    ap_p.add_argument("--cpu", action="store_true",
                      help="force the CPU backend (a dead axon relay makes "
                           "jax.devices() hang, CLAUDE.md gotchas; the env "
                           "var JAX_PLATFORMS is overridden by the plugin "
                           "so only jax.config works)")
    args = ap_p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.val_tiles:
        tiles, N_IMGS = loader_tiles(args.n_imgs, args.coco_path)
    else:
        N_IMGS = args.n_imgs
        tiles = synth_tiles(np.random.default_rng(0), N_IMGS)

    # run_detections pads the tail batch itself and trims the output.
    cfg32 = model_config("vit_b", dtype="float32")
    cfg16 = model_config("vit_b", dtype="bfloat16", use_flash_attention=True)
    cfg_crop = dataclasses.replace(cfg16, content_size=768)
    cfg_cp = dataclasses.replace(
        cfg_crop, crop_prologue=True,
        hfc=dataclasses.replace(cfg_crop.hfc,
                                compat_scrambled_reshape=False))

    m32 = WildlifeMapper(cfg32)
    params = jax.jit(m32.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, 1024, 1024, 3)))
    if args.orbax_checkpoint:
        params = load_trained(args.orbax_checkpoint, params)
        print(f"loaded trained params from {args.orbax_checkpoint}",
              flush=True)

    configs = [("f32-self ", cfg32), ("bf16+flash", cfg16),
               ("bf16+crop ", cfg_crop)]
    if not args.orbax_checkpoint:
        # crop_prologue is a different function; only meaningful vs random
        # init as a worst-case illustration (trained checkpoints are never
        # served in a mode they weren't trained in).
        configs.append(("bf16+crop_prologue", cfg_cp))

    gt = run(cfg32, params, tiles)
    n_gt = int((gt["scores"] > 0.3).sum())
    print(f"pseudo-GT detections: {n_gt}", flush=True)
    for tag, cfg in configs:
        dets = run(cfg, params, tiles)
        ap, ap50 = map_vs(gt, dets)
        print(f"{tag}: AP={ap:.4f} AP50={ap50:.4f}", flush=True)
        # Serving-threshold pseudo-GT (0.5, visualize_prediction.py:150):
        # drops the near-threshold noise queries whose sub-pixel shifts
        # dominate the strict @[.5:.95] drift on semi-trained checkpoints
        # (PERF.md round 4).
        ap_s, ap50_s = map_vs(gt, dets, gt_thresh=0.5)
        print(f"{tag.strip()}@serve0.5: AP={ap_s:.4f} AP50={ap50_s:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
