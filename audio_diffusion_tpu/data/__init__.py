from .loader import AudioDataset, wav_probe, wav_read

__all__ = ["AudioDataset", "wav_probe", "wav_read"]
