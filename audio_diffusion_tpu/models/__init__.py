from .encoders import MelEncoder1d, TanhBottleneck
from .model import AdapterBase, DiffusionModel, EncoderBase
from .tasks import DiffusionAE, DiffusionAR, DiffusionUpsampler, DiffusionVocoder

__all__ = [
    "DiffusionModel",
    "DiffusionAE",
    "DiffusionAR",
    "DiffusionUpsampler",
    "DiffusionVocoder",
    "EncoderBase",
    "AdapterBase",
    "MelEncoder1d",
    "TanhBottleneck",
]
