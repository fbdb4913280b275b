"""Speaker embeddings for diarization.

Pluggable backends:
  - ``SpectralEmbedding`` (default, weightless): log-mel statistics +
    deltas, L2-normalized. Crude but hermetic — keeps the diarization
    pipeline functional with no converted checkpoints.
  - converted neural embedding models (pyannote/wespeaker family) load via
    ``whisperx_tpu.convert`` checkpoints and share this interface.

Interface: ``embed(audio [B, samples]) -> [B, D] float32`` (unit-norm).
"""

from __future__ import annotations

import numpy as np

from whisperx_tpu.audio.mel import log_mel_spectrogram


class SpectralEmbedding:
    """Log-mel statistics embedding (hermetic default)."""

    dim = 240

    def embed(self, windows: np.ndarray) -> np.ndarray:
        """windows: [B, samples] → [B, dim] unit-norm embeddings."""
        out = np.zeros((len(windows), self.dim), np.float32)
        for i, w in enumerate(windows):
            mel = np.asarray(log_mel_spectrogram(w, 80))  # [80, T]
            mu = mel.mean(axis=1)
            sd = mel.std(axis=1)
            delta = np.abs(np.diff(mel, axis=1)).mean(axis=1) if mel.shape[1] > 1 else np.zeros(80)
            v = np.concatenate([mu, sd, delta])
            n = np.linalg.norm(v)
            out[i] = v / n if n > 0 else v
        return out
