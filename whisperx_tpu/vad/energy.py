"""Weightless spectral-energy VAD.

Not present in the reference (which always needs downloaded Silero/PyAnnote
weights); added so the TPU pipeline is fully functional on hermetic hosts
and as a cheap first-pass gate. Scores are adaptive-threshold normalized
band-limited log energies per 32 ms window, squashed to [0, 1] so the same
hysteresis segmenter applies.
"""

from __future__ import annotations

from typing import List

import numpy as np

from whisperx_tpu.audio.constants import SAMPLE_RATE
from whisperx_tpu.models.silero_vad.model import WINDOW_SIZE_SAMPLES
from whisperx_tpu.vad.silero import probs_to_speech_timestamps
from whisperx_tpu.vad.types import SpeechSegment


class EnergyVAD:
    """Speech/silence detection from band-limited energy statistics."""

    def __init__(self, vad_onset: float = 0.5, chunk_size: float = 30.0):
        self.vad_onset = vad_onset
        self.chunk_size = chunk_size

    def speech_probs(self, audio: np.ndarray) -> np.ndarray:
        audio = np.asarray(audio, np.float32).reshape(-1)
        n = len(audio)
        t = -(-n // WINDOW_SIZE_SAMPLES)
        padded = np.pad(audio, (0, t * WINDOW_SIZE_SAMPLES - n))
        frames = padded.reshape(t, WINDOW_SIZE_SAMPLES)
        # Band-limit to the speech band via first-difference pre-emphasis
        # (suppresses DC/rumble) before the energy statistic.
        emphasized = np.diff(frames, axis=1, prepend=frames[:, :1])
        energy = np.log10(np.mean(emphasized**2, axis=1) + 1e-10)
        # Adaptive squash: sigmoid around the midpoint between noise floor
        # and speech level estimates.
        lo = np.percentile(energy, 10)
        hi = np.percentile(energy, 95)
        if hi - lo < 1e-3:
            return np.zeros(t, np.float32)
        mid = 0.5 * (lo + hi)
        scale = 8.0 / max(hi - lo, 1e-3)
        return 1.0 / (1.0 + np.exp(-scale * (energy - mid)))

    def __call__(self, audio_dict, **options) -> List[SpeechSegment]:
        audio = np.asarray(audio_dict["waveform"], np.float32).reshape(-1)
        probs = self.speech_probs(audio)
        return probs_to_speech_timestamps(
            probs,
            len(audio),
            threshold=options.get("threshold", self.vad_onset),
            max_speech_duration_s=options.get(
                "max_speech_duration_s", self.chunk_size
            ),
        )
