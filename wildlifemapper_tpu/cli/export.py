"""Export CLI: serialize the detector to a portable StableHLO artifact.

The TPU-native analog of the reference's ONNX export entry (utils/onnx.py /
SamOnnxModel): any PJRT runtime (TPU/GPU/CPU) can load the artifact without
Python model code. With --polymorphic_batch one artifact serves every batch
size.

Usage:
  python -m wildlifemapper_tpu.cli.export --out model.stablehlo \
      [--checkpoint trained.pth | --orbax_checkpoint dir] \
      [--polymorphic_batch] [--content_size 768]

Serving example (any machine with jax + the artifact; no framework code):
  from jax import export as jax_export
  exported = jax_export.deserialize(open("model.stablehlo", "rb").read())
  out = exported.call(params, images)   # {'pred_logits', 'pred_boxes'}
"""

from __future__ import annotations

import argparse

from .train import add_config_args, config_from_args


def main(argv=None):
    p = add_config_args(argparse.ArgumentParser(__doc__))
    p.add_argument("--out", required=True, help="output artifact path")
    p.add_argument("--export_batch", type=int, default=1)
    p.add_argument("--polymorphic_batch", action="store_true",
                   help="symbolic batch dim: one artifact, any batch size")
    p.add_argument("--orbax_checkpoint", default=None)
    args = p.parse_args(argv)
    cfg = config_from_args(args)

    import jax
    import jax.numpy as jnp

    from ..compat.export import save_exported
    from ..models import WildlifeMapper

    model = WildlifeMapper(cfg.model)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(cfg.train.seed),
        jnp.zeros((1, cfg.model.img_size, cfg.model.img_size, 3)))
    if args.checkpoint:
        from ..compat.torch_convert import convert_checkpoint
        params, _ = convert_checkpoint(args.checkpoint, params,
                                       depth=cfg.model.vit.depth)
    else:
        if args.orbax_checkpoint:
            from ..train.checkpoints import CheckpointManager
            mgr = CheckpointManager(args.orbax_checkpoint)
            latest = mgr.latest_epoch()
            name = (f"checkpoint_epoch_{latest}" if latest is not None
                    else "best_checkpoint")
            restored = mgr.restore(name, None)
            params = restored["params"] if "params" in restored else restored

    path = save_exported(
        model, params, args.out,
        batch_size=None if args.polymorphic_batch else args.export_batch,
        img_size=cfg.model.img_size)
    print(f"exported -> {path} "
          f"({'polymorphic batch' if args.polymorphic_batch else f'batch={args.export_batch}'})")


if __name__ == "__main__":
    main()
