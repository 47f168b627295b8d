from .attention import Attention, AttentionItem, CrossAttentionItem, FeedForward
from .components import AppendChannelsPlugin, LTPlugin, UNetV0, XUNet
from .conv import Conv1d, ConvTranspose1d, conv1d, conv_transpose1d
from .net import Net
from .quant import (QTensor, dequantize_params, has_qtensors,
                    quantize_params, unpack_int4_leaves)

__all__ = [
    "QTensor",
    "quantize_params",
    "dequantize_params",
    "unpack_int4_leaves",
    "has_qtensors",
    "Net",
    "UNetV0",
    "XUNet",
    "LTPlugin",
    "AppendChannelsPlugin",
    "Conv1d",
    "ConvTranspose1d",
    "conv1d",
    "conv_transpose1d",
    "Attention",
    "AttentionItem",
    "CrossAttentionItem",
    "FeedForward",
]
