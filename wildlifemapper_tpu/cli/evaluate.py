"""Standalone evaluation CLI: run COCO mAP on a split with a trained
checkpoint (reference equivalent: calling inference.evaluate via train.py
with eval-only usage)."""

from __future__ import annotations

import argparse

from .train import add_config_args, config_from_args


def main(argv=None):
    p = add_config_args(argparse.ArgumentParser(__doc__))
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    p.add_argument("--orbax_checkpoint", default=None,
                   help="orbax checkpoint dir saved by our trainer")
    p.add_argument("--nms", action="store_true",
                   help="apply NMS 0.4 (the viz path's setting)")
    p.add_argument("--use_ema", action="store_true",
                   help="evaluate the EMA weights from an orbax checkpoint")
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument("--config_json", default=None,
                   help="config.json written by the trainer beside its "
                        "checkpoints; overrides the flag-derived model "
                        "config so from-scratch runs (crop_prologue, "
                        "window 12, ...) evaluate with the exact trained "
                        "architecture")
    args = p.parse_args(argv)
    cfg = config_from_args(args)
    if args.config_json:
        from ..config import config_from_json
        saved = config_from_json(open(args.config_json).read())
        import dataclasses
        cfg = dataclasses.replace(cfg, model=saved.model,
                                  criterion=saved.criterion)

    import jax

    from ..data.loader import DataLoader, build_dataset
    from ..eval.evaluate import evaluate
    from ..train.step import StepBuilder

    ds = build_dataset(args.split, cfg.data)
    loader = DataLoader(ds, cfg.data.batch_size, shuffle=False, drop_last=False)
    builder = StepBuilder(cfg)
    params = builder.init_params(jax.random.PRNGKey(0))

    if args.checkpoint:
        from ..compat.torch_convert import convert_checkpoint
        params, report = convert_checkpoint(args.checkpoint, params,
                                            depth=cfg.model.vit.depth)
        print(f"loaded {len(report['loaded'])} tensors "
              f"({len(report['missing'])} kept at init)")
    elif args.orbax_checkpoint:
        from ..train.checkpoints import CheckpointManager
        params = CheckpointManager.load_params(args.orbax_checkpoint,
                                               params, use_ema=args.use_ema)

    stats = evaluate(builder.jit_eval_step(), params, loader, ds.index, cfg,
                     apply_nms=args.nms, max_batches=args.max_batches)
    for k, v in stats.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
