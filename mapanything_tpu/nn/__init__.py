"""Network modules (flax.linen): encoders, multi-view trunks, heads, adaptors."""

from . import adaptors
from .dinov2 import DINOV2_CONFIGS, IMAGE_NORMALIZATION_DICT, DinoViT
from .dpt import DPTFeature, DPTRegressionProcessor
from .encoders import DenseRepEncoder, GlobalRepEncoder
from .heads import LinearFeature, MLPHead, PoseHead
from .layers import Attention, Block, LayerScale, Mlp
from .radio import RADIO_CONFIGS, RadioViT
from .trunk import AlternatingAttentionTrunk, GlobalAttentionTrunk

__all__ = [
    "adaptors",
    "AlternatingAttentionTrunk",
    "Attention",
    "Block",
    "DenseRepEncoder",
    "DinoViT",
    "DINOV2_CONFIGS",
    "DPTFeature",
    "DPTRegressionProcessor",
    "GlobalAttentionTrunk",
    "GlobalRepEncoder",
    "IMAGE_NORMALIZATION_DICT",
    "LayerScale",
    "LinearFeature",
    "MLPHead",
    "Mlp",
    "PoseHead",
    "RadioViT",
    "RADIO_CONFIGS",
]
