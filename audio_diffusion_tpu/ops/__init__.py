from .attention import Attention, AttentionItem, CrossAttentionItem, FeedForward
from .components import AppendChannelsPlugin, LTPlugin, UNetV0, XUNet
from .conv import Conv1d, ConvTranspose1d, conv1d, conv_transpose1d
from .net import Net

__all__ = [
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
