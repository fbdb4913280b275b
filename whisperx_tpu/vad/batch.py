"""Batched VAD over multiple audio streams in one device program.

Replaces the reference's thread-pool-over-files BatchVADProcessor
(whisperx/batch_vad.py:28-152, ThreadPoolExecutor(4) on CPU) with true
device batching: all files' windows are padded into one [B, T, 512] tensor
and a single jitted LSTM scan produces every stream's speech probabilities.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from whisperx_tpu.models.silero_vad.model import WINDOW_SIZE_SAMPLES
from whisperx_tpu.vad.silero import SileroVAD, probs_to_speech_timestamps
from whisperx_tpu.vad.types import SpeechSegment


class BatchVADProcessor:
    def __init__(self, vad: SileroVAD | None = None, **vad_options):
        if vad is None:
            # route through the factory: a bare SileroVAD() would carry
            # RANDOM LSTM weights and emit meaningless segments — the
            # factory warns and falls back to the energy VAD instead
            from whisperx_tpu.vad import load_vad_model

            vad = load_vad_model("silero", **vad_options)
        self.vad = vad
        self.stats: Dict[str, float] = {"files": 0, "batches": 0}

    def process_batch(
        self, audios: Sequence[np.ndarray], **options
    ) -> List[List[SpeechSegment]]:
        """VAD for several audio streams with ONE device call."""
        if not audios:
            return []
        import jax.numpy as jnp

        from whisperx_tpu.models.silero_vad.model import speech_probs

        lengths = [len(a) for a in audios]
        # t_max >= 1 so an all-empty batch still yields valid (B, 1) shapes;
        # zero-length rows short-circuit to "no speech" below.
        t_max = max(1, -(-max(lengths) // WINDOW_SIZE_SAMPLES))
        batch = np.zeros(
            (len(audios), t_max * WINDOW_SIZE_SAMPLES), np.float32
        )
        for i, a in enumerate(audios):
            batch[i, : len(a)] = np.asarray(a, np.float32)
        if hasattr(self.vad, "params"):  # real Silero weights
            windows = batch.reshape(len(audios), t_max, WINDOW_SIZE_SAMPLES)
            probs = np.asarray(
                speech_probs(self.vad.params, jnp.asarray(windows))
            )
        else:  # energy-VAD fallback (adaptive percentile stats are
            # per-stream: score each row at its TRUE length so a short
            # file's zero-padding can't skew its speech/noise threshold
            probs = np.zeros((len(audios), t_max), np.float32)
            for i, n in enumerate(lengths):
                if n == 0:  # empty stream: no speech, and the percentile
                    continue  # stats below need at least one window
                p = self.vad.speech_probs(batch[i, :n])
                probs[i, : len(p)] = p

        results = []
        for i, n in enumerate(lengths):
            t_real = -(-n // WINDOW_SIZE_SAMPLES)
            results.append(
                probs_to_speech_timestamps(
                    probs[i, :t_real],
                    n,
                    threshold=options.get("threshold", self.vad.vad_onset),
                    max_speech_duration_s=options.get(
                        "max_speech_duration_s", self.vad.chunk_size
                    ),
                )
            )
        self.stats["files"] += len(audios)
        self.stats["batches"] += 1
        return results

    def process_files(self, paths: Sequence[str], **options):
        from whisperx_tpu.audio import load_audio

        audios = [load_audio(p) for p in paths]
        return dict(zip(paths, self.process_batch(audios, **options)))
