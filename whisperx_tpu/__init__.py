"""whisperx_tpu — TPU-native WhisperX.

Lazy public API façade (parity: reference whisperx/__init__.py:1-41) — heavy
JAX/model imports happen on first attribute access, keeping CLI startup fast.
"""

import importlib

__version__ = "0.1.0"

_LAZY = {
    "load_model": ("whisperx_tpu.asr", "load_model"),
    "load_audio": ("whisperx_tpu.audio", "load_audio"),
    "align": ("whisperx_tpu.alignment", "align"),
    "load_align_model": ("whisperx_tpu.alignment", "load_align_model"),
    "assign_word_speakers": ("whisperx_tpu.diarize", "assign_word_speakers"),
    "load_pipeline": ("whisperx_tpu.pipeline", "load_pipeline"),
    "load_tpu_pipeline": ("whisperx_tpu.pipeline", "load_tpu_pipeline"),
    "DiarizationPipeline": ("whisperx_tpu.diarize", "DiarizationPipeline"),
}

__all__ = ["__version__", *_LAZY]


def __getattr__(name):
    if name in _LAZY:
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'whisperx_tpu' has no attribute {name!r}")


def __dir__():
    return sorted(__all__)
