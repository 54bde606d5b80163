"""Interactive predictor — the detection-era analog of the reference's
vestigial SamPredictor (predictor.py:269 / utils/transforms.py
ResizeLongestSide; SURVEY L9 'optional compatibility surface').

API mirrors SamPredictor's shape: set_image() pays the encoder once and
caches the embedding; predict() re-runs only the lightweight decoder (+
postprocess), which is the WildlifeMapper equivalent of prompt-driven
re-decoding. Useful for interactive tools sweeping thresholds/NMS settings
over one scene.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..data.transforms import (IMAGENET_MEAN, IMAGENET_STD, pad_to_canvas,
                               resize_keep_aspect)
from ..eval.postprocess import batched_nms, postprocess
from ..models.decoder import BoxDecoder
from ..models.pos_embed import PositionEmbeddingRandom
from ..models.vit import ImageEncoderViT
from ..ops.hfc import hfc_filter
from PIL import Image


class WildlifeMapperPredictor:
    def __init__(self, model, params, cfg: ModelConfig):
        self.model = model
        self.params = params
        self.cfg = cfg
        self._embedding = None
        self._orig_hw: Optional[tuple] = None

        # Standalone encoder/decoder modules sharing the detector's params
        # (WildlifeMapper is nn.compact, so submodules are re-instantiated
        # with identical hyperparams and fed their param subtrees).
        c = cfg
        encoder = ImageEncoderViT(
            img_size=c.img_size, patch_size=c.patch_size,
            embed_dim=c.vit.embed_dim, depth=c.vit.depth,
            num_heads=c.vit.num_heads, mlp_ratio=c.vit.mlp_ratio,
            out_chans=c.vit.out_chans, qkv_bias=c.vit.qkv_bias,
            use_abs_pos=c.vit.use_abs_pos, use_rel_pos=c.vit.use_rel_pos,
            window_size=c.vit.window_size,
            global_attn_indexes=c.vit.global_attn_indexes,
            hfc_embed_dim=c.hfc.embed_dim, hfc_num_heads=c.hfc.num_heads,
            hfc_ffn_dim=c.hfc.ffn_dim, hfc_proj_dim=c.hfc.proj_dim,
            hfc_dropout=c.hfc.dropout, use_flash=c.use_flash_attention,
            dtype=c.compute_dtype)
        pos_enc = PositionEmbeddingRandom(
            num_pos_feats=c.decoder.transformer_dim // 2,
            grid_size=c.grid_size, dtype=c.compute_dtype)
        decoder = BoxDecoder(
            transformer_dim=c.decoder.transformer_dim,
            num_queries=c.decoder.num_queries, num_logits=c.num_logits,
            head_hidden_dim=c.decoder.head_hidden_dim,
            head_depth=c.decoder.head_depth, depth=c.decoder.depth,
            num_heads=c.decoder.num_heads, mlp_dim=c.decoder.mlp_dim,
            attention_downsample_rate=c.decoder.attention_downsample_rate,
            dtype=c.compute_dtype)

        def encode(params, images):
            hfc = hfc_filter(images.astype(jnp.float32), c.hfc.rate)
            sub = {"params": params["params"]["image_encoder"]}
            return encoder.apply(sub, images.astype(c.compute_dtype),
                                 hfc.astype(c.compute_dtype))

        def decode(params, embedding):
            pe = pos_enc.apply({"params": params["params"]["pos_encoder"]})
            out = decoder.apply({"params": params["params"]["box_decoder"]},
                                embedding, pe)
            return {k: v.astype(jnp.float32) for k, v in out.items()}

        self._encode = jax.jit(encode)
        self._decode = jax.jit(decode)

    def set_image(self, image: np.ndarray):
        """image: (H, W, 3) uint8 RGB. Resizes/pads like the train pipeline
        and caches the image embedding."""
        h0, w0 = image.shape[:2]
        # content extent inside the canvas: the model's configured
        # content_size when set, else the train pipeline's 768-in-1024 ratio
        target = self.cfg.content_size or int(self.cfg.img_size * 768 / 1024)
        ow, oh = resize_keep_aspect((w0, h0), target, target)
        resized = np.asarray(
            Image.fromarray(image).resize((ow, oh), Image.BILINEAR))
        arr = ((resized.astype(np.float32) / 255.0) - IMAGENET_MEAN) / IMAGENET_STD
        arr = pad_to_canvas(arr, self.cfg.img_size)
        self._embedding = self._encode(self.params, jnp.asarray(arr[None]))
        self._orig_hw = (h0, w0)

    @property
    def is_image_set(self) -> bool:
        return self._embedding is not None

    def get_image_embedding(self):
        assert self.is_image_set, "call set_image first"
        return self._embedding

    def predict(self, score_threshold: float = 0.5, nms_iou: float = 0.4,
                apply_nms: bool = True) -> Dict[str, np.ndarray]:
        """Returns detections in *original image* coordinates."""
        assert self.is_image_set, "call set_image first"
        out = self._decode(self.params, self._embedding)
        h0, w0 = self._orig_hw
        # scale from normalized (content-frame) to original pixels
        dets = postprocess(out, jnp.asarray([[h0, w0]]), score_threshold,
                           hw_swap_compat=False)
        if apply_nms:
            dets["keep"] = batched_nms(dets["boxes"], dets["scores"],
                                       dets["labels"], dets["keep"], nms_iou,
                                       class_aware=False)
        dets = jax.device_get(dets)
        keep = dets["keep"][0]
        return {"boxes": dets["boxes"][0][keep],
                "scores": dets["scores"][0][keep],
                "labels": dets["labels"][0][keep]}

    def reset_image(self):
        self._embedding = None
        self._orig_hw = None
