from .transformer import Attention, CrossModalAttention, MLP, Transformer, LinearEmbedding
from .positional import (
    PositionalEncoding,
    PeriodicPositionalEncoding,
    PositionEmbedding,
    init_biased_mask,
    enc_dec_mask,
    sinusoid_table,
    get_2d_sincos_pos_embed,
)
from .convseq import ConvSquasher, ConvExpander, instance_norm_1d, conv1d_replicate
from .quantizer import VectorQuantizer, vq_quantize, vq_codebook_lookup

__all__ = [
    "Attention",
    "CrossModalAttention",
    "MLP",
    "Transformer",
    "LinearEmbedding",
    "PositionalEncoding",
    "PeriodicPositionalEncoding",
    "PositionEmbedding",
    "init_biased_mask",
    "enc_dec_mask",
    "sinusoid_table",
    "get_2d_sincos_pos_embed",
    "ConvSquasher",
    "ConvExpander",
    "instance_norm_1d",
    "conv1d_replicate",
    "VectorQuantizer",
    "vq_quantize",
    "vq_codebook_lookup",
]
