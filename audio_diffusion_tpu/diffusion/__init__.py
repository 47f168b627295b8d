from .core import alpha_beta, clip, extend_dim, pad_dims
from .distributions import Distribution, UniformDistribution
from .inpainter import Inpainter, VInpainter
from .samplers import (ARVSampler, DPMSampler, Sampler, SDESampler,
                       VSampler)
from .schedules import LinearSchedule, Schedule, UniformLambdaSchedule
from .vdiffusion import ARVDiffusion, Diffusion, VDiffusion, mse_loss

__all__ = [
    "alpha_beta",
    "clip",
    "extend_dim",
    "pad_dims",
    "Distribution",
    "UniformDistribution",
    "Schedule",
    "LinearSchedule",
    "UniformLambdaSchedule",
    "Diffusion",
    "VDiffusion",
    "ARVDiffusion",
    "mse_loss",
    "Sampler",
    "VSampler",
    "DPMSampler",
    "SDESampler",
    "ARVSampler",
    "Inpainter",
    "VInpainter",
]
