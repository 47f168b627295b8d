"""audio_diffusion_tpu — a TPU-native (JAX/XLA/Pallas) audio diffusion
framework with the capabilities and public API surface of
archinetai/audio-diffusion-pytorch (reference __init__.py:1-20 exports the
same names).
"""
from .diffusion import (
    ARVDiffusion,
    ARVSampler,
    Diffusion,
    Distribution,
    DPMSampler,
    SDESampler,
    Inpainter,
    LinearSchedule,
    Sampler,
    Schedule,
    UniformDistribution,
    UniformLambdaSchedule,
    VDiffusion,
    VInpainter,
    VSampler,
)
from . import presets
from .distill import ProgressiveDistiller
from .export import (ArtifactSampler, export_sampler, load_params,
                     load_sampler)
from .longform import generate_long
from .serve import GenerationService
from .server import make_server, wav_bytes
from .dsp import MelSpectrogram
from .models import (
    AdapterBase,
    DiffusionAE,
    DiffusionAR,
    DiffusionModel,
    DiffusionUpsampler,
    DiffusionVocoder,
    EncoderBase,
    MelEncoder1d,
    TanhBottleneck,
)
from .embed import CorpusEmbedder, frechet_embedding_distance
from .losses import MultiResolutionSTFTLoss, multi_resolution_stft_loss
from .ops import (AppendChannelsPlugin, LTPlugin, Net, QTensor, UNetV0,
                  XUNet, dequantize_params, quantize_params,
                  unpack_int4_leaves)

__version__ = "0.1.0"

__all__ = [
    "presets",
    "GenerationService",
    "generate_long",
    "make_server",
    "wav_bytes",
    "QTensor",
    "quantize_params",
    "dequantize_params",
    "unpack_int4_leaves",
    "CorpusEmbedder",
    "frechet_embedding_distance",
    "ProgressiveDistiller",
    "export_sampler",
    "load_sampler",
    "load_params",
    "ArtifactSampler",
    # reference public API (reference __init__.py:1-20)
    "LTPlugin",
    "MelSpectrogram",
    "UNetV0",
    "XUNet",
    "Diffusion",
    "Distribution",
    "LinearSchedule",
    "UniformLambdaSchedule",
    "Sampler",
    "Schedule",
    "UniformDistribution",
    "VDiffusion",
    "VInpainter",
    "VSampler",
    "DPMSampler",
    "SDESampler",
    "DiffusionAE",
    "DiffusionAR",
    "DiffusionModel",
    "DiffusionUpsampler",
    "DiffusionVocoder",
    "EncoderBase",
    # additional exports
    "ARVDiffusion",
    "ARVSampler",
    "Inpainter",
    "AdapterBase",
    "AppendChannelsPlugin",
    "Net",
    "MelEncoder1d",
    "TanhBottleneck",
    "MultiResolutionSTFTLoss",
    "multi_resolution_stft_loss",
]
