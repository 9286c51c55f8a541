from korean_f5_tts_tpu.ops.attention import sdpa
from korean_f5_tts_tpu.ops.mel import (
    MelConfig,
    istft,
    log_mel_spectrogram,
    mel_filterbank,
    stft_spectrogram,
)

__all__ = [
    "MelConfig",
    "istft",
    "log_mel_spectrogram",
    "mel_filterbank",
    "sdpa",
    "stft_spectrogram",
]
