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

from whisperx_tpu.audio.mel import log_mel_batch


class SpectralEmbedding:
    """Log-mel statistics embedding (hermetic default).

    Fully batched: one device program per power-of-two window bucket
    (``log_mel_batch``), then vectorized host stats — a 1-hour file is a
    handful of device calls, not thousands.
    """

    dim = 240

    def embed(self, windows: np.ndarray) -> np.ndarray:
        """windows: [B, samples] → [B, dim] unit-norm embeddings."""
        windows = np.asarray(windows, np.float32)
        if windows.ndim != 2:
            raise ValueError(f"expected [B, samples], got {windows.shape}")
        if len(windows) == 0:
            return np.zeros((0, self.dim), np.float32)
        mel = np.asarray(log_mel_batch(windows, 80))  # [B, T, 80]
        mu = mel.mean(axis=1)  # [B, 80]
        sd = mel.std(axis=1)
        if mel.shape[1] > 1:
            delta = np.abs(np.diff(mel, axis=1)).mean(axis=1)
        else:
            delta = np.zeros_like(mu)
        v = np.concatenate([mu, sd, delta], axis=1)  # [B, 240]
        n = np.linalg.norm(v, axis=1, keepdims=True)
        return (v / np.where(n > 0, n, 1.0)).astype(np.float32)
