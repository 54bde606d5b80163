from .detector import WildlifeMapper
from .vit import ImageEncoderViT
from .decoder import BoxDecoder, TwoWayTransformer
from .adaptor import CrossAttentionHfcPatch
from .pos_embed import PositionEmbeddingRandom

__all__ = [
    "WildlifeMapper", "ImageEncoderViT", "BoxDecoder", "TwoWayTransformer",
    "CrossAttentionHfcPatch", "PositionEmbeddingRandom",
]
