from .mel import MelSpectrogram, melscale_fbanks, stft
from .resample import downsample, resample, upsample

__all__ = [
    "resample",
    "downsample",
    "upsample",
    "stft",
    "melscale_fbanks",
    "MelSpectrogram",
]
