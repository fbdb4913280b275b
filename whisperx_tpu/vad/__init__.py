"""Voice-activity detection subsystem (reference whisperx/vads/ parity).

Methods: ``silero`` (JAX LSTM, default), ``energy`` (weightless), ``pyannote``
(JAX segmentation model + Binarize min-cut), ``hybrid`` (auto-select).
"""

from __future__ import annotations

from typing import Optional

from whisperx_tpu.vad.binarize import Binarize
from whisperx_tpu.vad.energy import EnergyVAD
from whisperx_tpu.vad.merge import merge_chunks
from whisperx_tpu.vad.silero import SileroVAD, probs_to_speech_timestamps
from whisperx_tpu.vad.types import SpeechSegment


class HybridVAD:
    """Pick the best available backend (parity: vads/hybrid_vad.py:24-31 —
    the reference auto-selects CPU Silero vs MLX VAD; here real Silero
    weights win over the energy fallback)."""

    def __init__(self, vad_onset: float = 0.5, chunk_size: float = 30.0, **kw):
        self.backend = load_vad_model(
            "silero", vad_onset=vad_onset, chunk_size=chunk_size, **kw
        )
        self.stats = {"calls": 0}

    def __call__(self, audio_dict, **options):
        self.stats["calls"] += 1
        return self.backend(audio_dict, **options)

    def __getattr__(self, name):
        # expose the active backend's capabilities/config — without this,
        # asr.py's getattr(vad, 'supports_device_audio', False) sees the
        # wrapper and pulls device-resident audio back over the tunnel
        return getattr(self.backend, name)


def load_vad_model(
    method: str = "silero",
    *,
    vad_onset: float = 0.5,
    vad_offset: float = 0.363,
    chunk_size: float = 30.0,
    model_path: Optional[str] = None,
    **kwargs,
):
    """VAD factory (parity: reference asr.py:240-272 vad_method dispatch)."""
    method = (method or "silero").lower()
    if method == "silero":
        if model_path:
            return SileroVAD.from_checkpoint(
                model_path, vad_onset=vad_onset, chunk_size=chunk_size
            )
        import os

        default = os.environ.get("WHISPERX_TPU_SILERO_CKPT")
        if default and os.path.isdir(default):
            return SileroVAD.from_checkpoint(
                default, vad_onset=vad_onset, chunk_size=chunk_size
            )
        # No converted weights: the energy VAD is the functional fallback
        # (random LSTM weights would produce meaningless segmentation).
        import warnings

        warnings.warn(
            "No converted Silero checkpoint (set WHISPERX_TPU_SILERO_CKPT "
            "or pass model_path); falling back to the weightless energy "
            "VAD.",
            stacklevel=2,
        )
        return EnergyVAD(vad_onset=vad_onset, chunk_size=chunk_size)
    if method == "energy":
        return EnergyVAD(vad_onset=vad_onset, chunk_size=chunk_size)
    if method == "pyannote":
        from whisperx_tpu.vad.pyannote_vad import PyannoteVAD

        return PyannoteVAD(
            vad_onset=vad_onset,
            vad_offset=vad_offset,
            chunk_size=chunk_size,
            model_path=model_path,
        )
    if method == "hybrid":
        return HybridVAD(vad_onset=vad_onset, chunk_size=chunk_size)
    raise ValueError(f"Unknown VAD method: {method}")


__all__ = [
    "Binarize",
    "EnergyVAD",
    "HybridVAD",
    "SileroVAD",
    "SpeechSegment",
    "load_vad_model",
    "merge_chunks",
    "probs_to_speech_timestamps",
]
