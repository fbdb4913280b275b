"""Weightless spectral-energy VAD.

Not present in the reference (which always needs downloaded Silero/PyAnnote
weights); added so the TPU pipeline is fully functional on hermetic hosts
and as a cheap first-pass gate. Scores are adaptive-threshold normalized
band-limited log energies per 32 ms window, squashed to [0, 1] so the same
hysteresis segmenter applies.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.audio.constants import SAMPLE_RATE
from whisperx_tpu.models.silero_vad.model import WINDOW_SIZE_SAMPLES
from whisperx_tpu.vad.silero import probs_to_speech_timestamps
from whisperx_tpu.vad.types import SpeechSegment

# Absolute floor (log10 mean-square of the pre-emphasized window) below
# which a window is never speech: the percentile squash alone is purely
# RELATIVE, so noise-only recordings would otherwise have their louder
# half classified as speech. Speech at normal levels sits far above
# (amplitude 0.05 → ≈ -2.6); room tone/fan noise sits below.
ENERGY_FLOOR = -7.0


def _masked_percentile(sorted_vals: jnp.ndarray, q: float, n_valid) -> jnp.ndarray:
    """np.percentile('linear') over the first n_valid entries of a sorted
    array whose invalid tail is +inf."""
    pos = q / 100.0 * (n_valid - 1)
    i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, sorted_vals.shape[0] - 1)
    i1 = jnp.minimum(i0 + 1, n_valid - 1)
    frac = pos - jnp.floor(pos)
    return sorted_vals[i0] * (1.0 - frac) + sorted_vals[i1] * frac


@jax.jit
def _energy_probs_jit(audio: jnp.ndarray, n_windows) -> jnp.ndarray:
    """Device-resident energy VAD probability pass: [L] (L divisible by the
    512-sample window; zeros beyond the real audio) → per-window speech
    prob [L // 512]. Percentile statistics mask the padded tail so the
    result matches the host path on the first ``n_windows`` entries."""
    t_pad = audio.shape[0] // WINDOW_SIZE_SAMPLES
    frames = audio.reshape(t_pad, WINDOW_SIZE_SAMPLES)
    emphasized = jnp.diff(frames, axis=1, prepend=frames[:, :1])
    energy = jnp.log10(jnp.mean(emphasized**2, axis=1) + 1e-10)
    valid = jnp.arange(t_pad) < n_windows
    es = jnp.sort(jnp.where(valid, energy, jnp.inf))
    lo = _masked_percentile(es, 10.0, n_windows)
    hi = _masked_percentile(es, 95.0, n_windows)
    mid = 0.5 * (lo + hi)
    scale = 8.0 / jnp.maximum(hi - lo, 1e-3)
    # tanh form of the sigmoid: exp(±large) overflows f32 for windows far
    # from mid (e.g. digital silence), tanh saturates cleanly
    probs = 0.5 * (1.0 + jnp.tanh(0.5 * scale * (energy - mid)))
    probs = jnp.where(energy < ENERGY_FLOOR, 0.0, probs)
    return jnp.where(hi - lo < 1e-3, 0.0, probs)


class EnergyVAD:
    """Speech/silence detection from band-limited energy statistics."""

    supports_device_audio = True

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
        # tanh form of the sigmoid (see _energy_probs_jit): identical
        # values, no RuntimeWarning overflow on digital-silence windows
        probs = 0.5 * (1.0 + np.tanh(0.5 * scale * (energy - mid)))
        return np.where(energy < ENERGY_FLOOR, 0.0, probs).astype(np.float32)

    def __call__(self, audio_dict, **options) -> List[SpeechSegment]:
        wav = audio_dict["waveform"]
        if isinstance(wav, jnp.ndarray):
            # device-resident path: probs computed on device, only the
            # tiny per-window prob vector crosses the tunnel
            n = int(audio_dict.get("length", wav.shape[0]))
            pad = (-wav.shape[0]) % WINDOW_SIZE_SAMPLES
            if pad:  # the jit requires window divisibility; pad on device
                wav = jnp.pad(wav, (0, pad))
            t = -(-n // WINDOW_SIZE_SAMPLES)
            probs = np.asarray(_energy_probs_jit(wav, t))[:t]
        else:
            audio = np.asarray(wav, np.float32).reshape(-1)
            n = len(audio)
            probs = self.speech_probs(audio)
        return probs_to_speech_timestamps(
            probs,
            n,
            threshold=options.get("threshold", self.vad_onset),
            max_speech_duration_s=options.get(
                "max_speech_duration_s", self.chunk_size
            ),
        )
