from whisperx_tpu.backends.base import WhisperBackend
from whisperx_tpu.backends.jax_whisper import (
    BatchedJAXBackend,
    SequentialJAXBackend,
    load_backend,
)

__all__ = [
    "WhisperBackend",
    "BatchedJAXBackend",
    "SequentialJAXBackend",
    "load_backend",
]
