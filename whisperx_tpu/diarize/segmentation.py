"""Segmentation-driven speaker activity (pyannote-3.1-class architecture).

The reference wraps ``pyannote/speaker-diarization-3.1``
(whisperx/diarize.py:11-83), whose pipeline is:

  1. a PyanNet segmentation model slid over ~10 s windows, emitting
     per-frame POWERSET speaker activity (local speakers, overlap-aware);
  2. neural embeddings extracted per (window, local speaker), using only
     frames where that speaker is active ALONE;
  3. constrained clustering of those embeddings → global speaker labels;
  4. aggregation of the window-local activities under the global labels.

This module implements steps 1-2's machinery TPU-first: all windows run
through the segmentation network in ONE batched jitted call, the powerset →
multilabel decode is a single gather, and the clean-frame masks come out
vectorized. Step 3 reuses ``diarize.clustering``; step 4 lives in
``DiarizationPipeline``.
"""

from __future__ import annotations

import itertools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.audio import SAMPLE_RATE


def powerset_table(num_classes: int) -> np.ndarray:
    """Powerset-class → multilabel matrix [num_classes, n_speakers].

    pyannote's powerset order: subsets sorted by cardinality, then by
    member index — ∅, {0}, {1}, {2}, {0,1}, {0,2}, {1,2} for 3 speakers
    with ≤2 simultaneous. The (n_speakers, max_set_size) pair is recovered
    from ``num_classes`` alone.
    """
    for n_spk in range(1, 8):
        for max_size in range(1, n_spk + 1):
            n = sum(
                len(list(itertools.combinations(range(n_spk), k)))
                for k in range(max_size + 1)
            )
            if n == num_classes:
                table = np.zeros((num_classes, n_spk), np.float32)
                row = 0
                for k in range(max_size + 1):
                    for combo in itertools.combinations(range(n_spk), k):
                        table[row, list(combo)] = 1.0
                        row += 1
                return table
    raise ValueError(f"no (n_speakers, overlap) matches {num_classes} classes")


class SpeakerSegmenter:
    """Batched sliding-window PyanNet speaker segmentation.

    ``activity(audio)`` → ``(act, starts, frame_dur)`` where ``act`` is
    [n_windows, frames, n_local_speakers] binary speaker activity, ``starts``
    the window start times (s), and ``frame_dur`` the seconds per output
    frame.
    """

    def __init__(self, params=None, config=None, window_s: float = 10.0,
                 step_s: float = 5.0):
        from whisperx_tpu.models.pyannote.model import (
            PyanNetConfig,
            TEST_CONFIG,
            forward,
            init_params,
        )

        if config is None:
            config = TEST_CONFIG
        if params is None:
            params = init_params(config, jax.random.PRNGKey(0))
        self.params = params
        self.config = config
        self.window_s = float(window_s)
        self.step_s = float(step_s)
        self.table = powerset_table(config.num_classes)
        self.n_local_speakers = self.table.shape[1]
        self._jitted = jax.jit(lambda p, a: forward(p, config, a))

    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "SpeakerSegmenter":
        from whisperx_tpu.convert.checkpoint import load_checkpoint
        from whisperx_tpu.models.pyannote.model import PyanNetConfig

        params, meta = load_checkpoint(path)
        cfg_dict = dict(meta["config"])
        cfg = PyanNetConfig(
            sincnet_filters=tuple(cfg_dict["sincnet_filters"]),
            sincnet_kernels=tuple(cfg_dict["sincnet_kernels"]),
            sincnet_strides=tuple(
                cfg_dict.get("sincnet_strides", (10, 1, 1))
            ),
            pool_size=cfg_dict.get("pool_size", 3),
            lstm_hidden=cfg_dict["lstm_hidden"],
            lstm_layers=cfg_dict["lstm_layers"],
            linear_dims=tuple(cfg_dict["linear_dims"]),
            num_classes=cfg_dict["num_classes"],
        )
        return cls(params, cfg, **kw)

    def windows(self, audio: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Slice audio into the sliding windows: ([W, win_samples], starts)."""
        audio = np.asarray(audio, np.float32).reshape(-1)
        win = int(self.window_s * SAMPLE_RATE)
        step = int(self.step_s * SAMPLE_RATE)
        if len(audio) <= win:
            chunk = np.pad(audio, (0, win - len(audio)))
            return chunk[None], np.zeros(1)
        starts = list(range(0, len(audio) - win + step, step))
        out = np.zeros((len(starts), win), np.float32)
        for i, s in enumerate(starts):
            seg = audio[s : s + win]
            out[i, : len(seg)] = seg
        return out, np.asarray(starts, np.float64) / SAMPLE_RATE

    def activity(
        self, audio: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray, float]:
        chunks, starts = self.windows(audio)
        scores = np.asarray(self._jitted(self.params, jnp.asarray(chunks)))
        # powerset argmax → multilabel lookup (one gather)
        classes = scores.argmax(axis=-1)  # [W, F]
        act = self.table[classes]  # [W, F, K]
        frames = scores.shape[1]
        frame_dur = self.window_s / frames
        return act, starts, frame_dur


def clean_frame_masks(act: np.ndarray, min_frames: int = 4) -> np.ndarray:
    """Per-(window, speaker) embedding masks from single-speaker frames.

    act: [W, F, K] binary. Returns masks [W, K, F]: frames where speaker k
    is active ALONE in window w; falls back to all active frames when fewer
    than ``min_frames`` are clean, and to zeros when the speaker is absent.
    """
    w, f, k = act.shape
    total = act.sum(axis=2, keepdims=True)  # [W, F, 1]
    solo = (act * (total == 1)).transpose(0, 2, 1)  # [W, K, F]
    anyact = act.transpose(0, 2, 1)
    use_solo = solo.sum(axis=2, keepdims=True) >= min_frames
    return np.where(use_solo, solo, anyact).astype(np.float32)
