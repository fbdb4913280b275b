from whisperx_tpu.audio.io import load_audio, pad_or_trim
from whisperx_tpu.audio.mel import log_mel_spectrogram, mel_filters
from whisperx_tpu.audio.constants import (
    SAMPLE_RATE,
    N_FFT,
    HOP_LENGTH,
    CHUNK_LENGTH,
    N_SAMPLES,
    N_FRAMES,
    N_SAMPLES_PER_TOKEN,
    FRAMES_PER_SECOND,
    TOKENS_PER_SECOND,
)

__all__ = [
    "load_audio",
    "pad_or_trim",
    "log_mel_spectrogram",
    "mel_filters",
    "SAMPLE_RATE",
    "N_FFT",
    "HOP_LENGTH",
    "CHUNK_LENGTH",
    "N_SAMPLES",
    "N_FRAMES",
    "N_SAMPLES_PER_TOKEN",
    "FRAMES_PER_SECOND",
    "TOKENS_PER_SECOND",
]
