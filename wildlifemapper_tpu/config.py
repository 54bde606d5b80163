"""Typed configuration for the WildlifeMapper-TPU framework.

The reference (lgemc/WildlifeMapper) spreads its configuration across argparse
flags (`wildlifemapper/train.py:46-115`) and hardcoded constants
(`build_sam.py:268-306`, `network.py:36`, `dataloader_coco.py:278-290`,
`segment_anything/utils/misc.py:50`). Here every knob lives in one frozen
dataclass tree so jitted functions can close over static values.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    """SAM ViT image-encoder hyperparameters (reference: build_sam.py:19-52, 260-288)."""

    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    mlp_ratio: float = 4.0
    window_size: int = 14
    out_chans: int = 256  # neck output channels (prompt_embed_dim)
    qkv_bias: bool = True
    use_rel_pos: bool = True
    use_abs_pos: bool = True


# Registry mirroring the reference's sam_model_registry (build_sam.py:55-60).
VIT_B = ViTConfig()
VIT_L = ViTConfig(embed_dim=1024, depth=24, num_heads=16,
                  global_attn_indexes=(5, 11, 17, 23))
VIT_H = ViTConfig(embed_dim=1280, depth=32, num_heads=16,
                  global_attn_indexes=(7, 15, 23, 31))

VIT_REGISTRY = {
    "vit_b": VIT_B,
    "vit_l": VIT_L,
    "vit_h": VIT_H,
    "default": VIT_H,
}


@dataclasses.dataclass(frozen=True)
class HFCConfig:
    """High-frequency-component adaptor (reference: network.py:36-57,
    image_encoder.py:65-87, 452-516)."""

    rate: float = 0.125           # band-stop rate of the Fourier mask
    embed_dim: int = 1024         # HfcEmbed output channels
    proj_dim: int = 1024          # cross-attention internal dim
    num_heads: int = 8
    ffn_dim: int = 1024
    dropout: float = 0.1
    # The reference reinterprets the (B, HW, F) adaptor output as
    # (B, F, H, W) without a transpose before proj_back
    # (image_encoder.py:512), scrambling tokens across channels; released
    # checkpoints were trained through it. False = the token-preserving
    # projection for from-scratch training.
    compat_scrambled_reshape: bool = True


@dataclasses.dataclass(frozen=True)
class DecoderConfig:
    """DETR-style detection decoder (reference: build_sam.py:295-306,
    box_decoder.py:16-107, transformer.py:16-60)."""

    transformer_dim: int = 256
    depth: int = 2
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    num_queries: int = 51         # num_multimask_outputs=50 (+1), build_sam.py:296
    head_hidden_dim: int = 256
    head_depth: int = 3
    # deep supervision on intermediate decoder layers (plumbed-but-inactive
    # in the reference: box_decoder.py:26, build_sam.py:195-208)
    aux_loss: bool = False


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vit: ViTConfig = VIT_B
    hfc: HFCConfig = HFCConfig()
    decoder: DecoderConfig = DecoderConfig()
    img_size: int = 1024
    patch_size: int = 16
    # 6 real classes with ids 1..6; id 0 unused; index num_classes(=7) is
    # the no-object/background logit (reference: box_decoder.py:50, build_sam.py:273).
    num_classes: int = 7
    # Compute dtype for the hot path; params always live in float32.
    dtype: str = "float32"
    # Use the Pallas flash-attention kernel for global attention blocks
    # (jnp fallback otherwise; interpret mode on CPU backends).
    use_flash_attention: bool = False
    # Attention kernel layout (only with use_flash_attention):
    #   "packed"  — v2: windowed AND global kernels consume the packed
    #               (.., N, 3C) qkv GEMM output, heads split in-kernel;
    #               no XLA-side qkv transposes on the forward path.
    #   "grouped" — v1: per-(window-)head operands (keeps the 5-D
    #               transpose; reference-shaped data flow).
    attn_impl: str = "packed"
    # Content-crop fast path. The reference zero-pads the resized 768px
    # content into a 1024px canvas (misc.py:50, dataloader_coco.py:278-290)
    # and then spends 44% of the encoder FLOPs attending bias-only pad
    # tokens. With content_size set (e.g. 768), the prologue (HFC, patch
    # embeds, abs pos, HFC adaptor — incl. the 64-grid scrambled reshape the
    # released weights depend on) runs at the full canvas for exact parity,
    # then the token grid is cropped to content_size/patch (48x48) for the
    # ViT blocks, neck, and decoder. Checkpoint layout is unchanged: pos
    # embeds are sliced top-left and the global-attention rel-pos tables are
    # center-sliced (same patch resolution => same relative-distance
    # embeddings). None = full-canvas reference behavior.
    content_size: Optional[int] = None
    # Crop the *pixels* before the prologue too: HFC, patch embeds, and the
    # adaptor all run at content_size (e.g. 768^2 -> 48x48 tokens) instead
    # of the zero-padded canvas. Only valid with content_size set and
    # hfc.compat_scrambled_reshape=False — the scrambled reshape mixes
    # tokens across the full 64-grid, so checkpoint-compatible runs need
    # the full-canvas prologue. This is the from-scratch training
    # configuration: train and eval see the same (cheaper) function.
    crop_prologue: bool = False
    # Rematerialize each ViT block's activations in the backward pass
    # (jax.checkpoint / flax nn.remat): trades ~1 extra forward of block
    # FLOPs for O(depth) -> O(1) stored activations — the knob that fits
    # ViT-L/H training batches in HBM. No effect on inference.
    remat_blocks: bool = False

    def __post_init__(self):
        if self.crop_prologue:
            if self.content_size is None:
                raise ValueError("crop_prologue requires content_size")
            if self.hfc.compat_scrambled_reshape:
                raise ValueError(
                    "crop_prologue requires "
                    "hfc.compat_scrambled_reshape=False: the scrambled "
                    "reshape (image_encoder.py:512) mixes tokens across the "
                    "full 64-grid, so the checkpoint-compatible prologue "
                    "must run at the full canvas")

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size  # 64

    @property
    def num_logits(self) -> int:
        return self.num_classes + 1  # 8

    @property
    def content_grid(self) -> Optional[int]:
        if self.content_size is None:
            return None
        return self.content_size // self.patch_size  # 48 for 768

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


@dataclasses.dataclass(frozen=True)
class MatchCriterionConfig:
    """Hungarian matching + DETR set-criterion weights
    (reference: train.py:62-101, build_sam.py:326-331)."""

    set_cost_class: float = 1.0
    set_cost_bbox: float = 5.0
    set_cost_giou: float = 2.0
    ce_loss_coef: float = 3.0
    bbox_loss_coef: float = 5.0
    giou_loss_coef: float = 2.0
    eos_coef: float = 0.1
    # Static padded target count per image. The bundled train split peaks at
    # 118 boxes/img (p99 = 57), so 128 loses nothing on the bundled dataset
    # (the reference trains on ragged, untruncated targets,
    # dataloader_coco.py:253-270); pad_targets warns if it ever truncates.
    max_targets: int = 128


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset + preprocessing (reference: dataloader_coco.py, augmentation.py,
    misc.py:46-67)."""

    coco_path: str = "/root/reference/coco_annotations"
    image_root: str = ""          # directory containing train/ and val/ images
    resize_size: int = 768        # RandomResize([768], max_size=768)
    canvas_size: int = 1024       # zero-pad canvas (misc.py:50)
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    flip_prob: float = 0.5        # train-only FlipLR(0.5)
    # The reference's FlipLR applies torch.fliplr to a CHW tensor, flipping H
    # (a *vertical* flip) while updating cy (augmentation.py:265-285). True
    # replicates that; False gives a genuine horizontal flip.
    flip_is_vertical: bool = True
    # The reference's 4-image mosaic path is dead code (gate `== '_train'`
    # vs passed 'train', dataloader_coco.py:34). Off by default for parity.
    use_mosaic: bool = False
    # Fixed padded target count per image. None (default) sizes it from the
    # annotation file's densest image at dataset construction, so no GT is
    # ever dropped (the reference trains on ragged, untruncated targets —
    # dataloader_coco.py:253-270). An explicit int that undersizes the
    # dataset is an error unless allow_truncation opts in.
    max_targets: Optional[int] = None
    # Opt-in lossy truncation when max_targets deliberately undersizes the
    # dataset (tiny test harnesses). Never set for real training.
    allow_truncation: bool = False
    batch_size: int = 6
    num_workers: int = 2
    # "thread" (PIL releases the GIL around decode) or "process" (fork
    # worker pool — full parallelism for the numpy augmentation work; the
    # right choice on multi-core training hosts).
    worker_mode: str = "thread"
    # Ship uint8 canvases and normalize inside the jitted step: 4x less
    # host->device transfer (identical math; see PreprocessConfig).
    device_normalize: bool = False
    synthetic: bool = False       # generate random tiles when images are absent
    # Render synthetic tiles at this size instead of the annotation file's
    # recorded dims (annotations are rescaled to match) — scaled-down
    # proxy experiments render 16x fewer pixels at 256 than at 1024.
    synthetic_size: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference: train.py:62-101, 215-222)."""

    lr: float = 1e-4
    hfc_lr: float = 1e-4          # second param group, train.py:215-221
    weight_decay: float = 1e-3
    epochs: int = 550
    lr_drop: int = 40             # StepLR step size
    lr_drop_factor: float = 0.1
    clip_max_norm: float = 0.1
    seed: int = 42
    checkpoint_every: int = 40
    # Run val evaluation every N epochs (always on the final epoch). The
    # reference evaluates every epoch (train.py:325); >1 trades per-epoch
    # val metrics for wall-clock on long runs (COCOeval is host-bound).
    eval_every: int = 1
    # Consider a best_checkpoint save at most every N epochs (reference
    # saves best-by-train-loss every epoch, train.py:344-358 — but on a
    # steadily-converging run that is a full state fetch + write per epoch;
    # over a remote-device tunnel it can be ~30% of epoch time). The best
    # epoch SINCE THE LAST ALLOWED SAVE still wins, so nothing is lost
    # except save frequency. 1 = reference parity.
    best_every: int = 1
    # Freeze policy (reference: network.py:19-34): inside the encoder only
    # hfc_embed / hfc_attn / patch_embed train; decoder fully trains;
    # the dense-PE gaussian matrix is a buffer (never trained).
    freeze_encoder: bool = True
    use_amp: bool = False         # bf16 compute in the train step
    # Not in the reference (useful when training from scratch rather than
    # from the surgically-loaded SAM checkpoint): linear LR warmup steps and
    # an exponential moving average of the trainable params (0 = off).
    warmup_steps: int = 0
    ema_decay: float = 0.0
    # Param-histogram logging cadence in epochs (0 = off). Equivalent of the
    # reference's wandb model watch / histogram tables
    # (wandb_logger.py:101-120, 272-288).
    log_histograms_every: int = 0
    # Best-checkpoint selection metric: "train_loss" = reference parity
    # (best-by-lowest-epoch-train-loss, train.py:357-368); "val_ap" keeps
    # the highest val COCO AP instead — it only updates on epochs that run
    # evaluation, so pair it with a matching eval_every cadence.
    best_metric: str = "train_loss"


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Post-processing + COCO evaluation (reference: build_sam.py:212-258,
    visualize_prediction.py:36,150-157)."""

    confidence_threshold: float = 0.05
    viz_confidence_threshold: float = 0.5
    nms_iou: float = 0.4
    max_detections: int = 51
    # Reference PostProcess swaps h/w when scaling boxes to original image
    # coordinates (build_sam.py:252) — harmless on square tiles, wrong
    # otherwise. True replicates; False fixes.
    hw_swap_compat: bool = True


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout. data = batch sharding (DP), model = tensor
    sharding of attention heads / MLP hidden dims (TP)."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    model: ModelConfig = ModelConfig()
    criterion: MatchCriterionConfig = MatchCriterionConfig()
    data: DataConfig = DataConfig()
    train: TrainConfig = TrainConfig()
    eval: EvalConfig = EvalConfig()
    mesh: MeshConfig = MeshConfig()


def model_config(variant: str = "vit_b", **overrides) -> ModelConfig:
    """Build a ModelConfig for a registry variant ('vit_b'|'vit_l'|'vit_h')."""
    vit = VIT_REGISTRY[variant]
    return dataclasses.replace(ModelConfig(vit=vit), **overrides)


# ---- persistence -----------------------------------------------------------
# The reference reconstructs eval-time models by re-typing the training
# flags; here the exact Config is written next to the checkpoints so a
# from-scratch run (e.g. --crop_prologue --window_size 12) is reproducible
# without remembering its flag set.

def config_to_json(cfg: Config) -> str:
    import json

    return json.dumps(dataclasses.asdict(cfg), indent=2, sort_keys=True)


def _from_dict(cls, d):
    # `from __future__ import annotations` stringifies f.type, so nested
    # dataclass types are resolved from the field defaults (every nested
    # config field has a dataclass default).
    defaults = cls()
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        default = getattr(defaults, f.name)
        if dataclasses.is_dataclass(default) and isinstance(v, dict):
            v = _from_dict(type(default), v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def config_from_json(text: str) -> Config:
    import json

    return _from_dict(Config, json.loads(text))
