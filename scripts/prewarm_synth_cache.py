#!/usr/bin/env python
"""Pre-render the synthetic tile cache (WM_SYNTH_CACHE) for a coco_path.

The 1-core host renders ~45 min of tiles on a training run's first epoch
(data/loader.py synth cache notes); running this ahead of a bounded
training leg (scripts/r4_pipeline.sh stage 3a) keeps that leg's timeout
budget for compile + actual steps. Idempotent: cached tiles are skipped
via the loader's own fingerprinted disk key.

Usage: python scripts/prewarm_synth_cache.py --coco_path /tmp/prof/ann_x4
"""
import argparse
import sys
import time

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--coco_path", required=True)
    p.add_argument("--splits", default="train,val")
    p.add_argument("--synthetic_size", type=int, default=None)
    p.add_argument("--device_normalize", action="store_true", default=True)
    args = p.parse_args()

    from wildlifemapper_tpu.config import DataConfig
    from wildlifemapper_tpu.data.loader import build_dataset

    for split in args.splits.split(","):
        cfg = DataConfig(coco_path=args.coco_path, image_root="",
                         synthetic=True, synthetic_size=args.synthetic_size,
                         device_normalize=args.device_normalize)
        ds = build_dataset(split, cfg)
        t0 = time.time()
        for i in range(len(ds)):
            ds._raw(i)
            if (i + 1) % 50 == 0 or i + 1 == len(ds):
                dt = time.time() - t0
                print(f"[{split}] {i + 1}/{len(ds)} tiles "
                      f"({dt:.0f}s, {(i + 1) / max(dt, 1e-9):.2f}/s)",
                      flush=True)
    print("PREWARM_DONE", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
