"""PyAnnote-style VAD: segmentation network + hysteresis Binarize + min-cut.

Parity with reference whisperx/vads/pyannote.py (sliding-window scores →
Binarize with min-cut splitting, vad_onset/vad_offset thresholds). With no
converted segmentation weights the frame scores come from the energy
detector, so the Binarize/min-cut path stays fully exercised.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from whisperx_tpu.audio.constants import SAMPLE_RATE
from whisperx_tpu.vad.binarize import Binarize
from whisperx_tpu.vad.types import SpeechSegment


class PyannoteVAD:
    WINDOW_S = 10.0  # segmentation model window
    STEP_S = 1.0

    def __init__(
        self,
        vad_onset: float = 0.500,
        vad_offset: float = 0.363,
        chunk_size: float = 30.0,
        model_path: Optional[str] = None,
        **kwargs,
    ):
        self.vad_onset = vad_onset
        self.vad_offset = vad_offset
        self.chunk_size = chunk_size
        self._model = None
        self._cfg = None
        if model_path:
            from whisperx_tpu.convert.checkpoint import load_checkpoint
            from whisperx_tpu.models.pyannote.model import PyanNetConfig

            params, meta = load_checkpoint(model_path)
            self._model = params
            self._cfg = PyanNetConfig(**meta["config"])

    def _frame_scores(self, audio: np.ndarray):
        """Returns (scores [T], timestamps [T])."""
        if self._model is not None:
            import jax.numpy as jnp

            from whisperx_tpu.models.pyannote.model import forward

            win = int(self.WINDOW_S * SAMPLE_RATE)
            step = int(self.STEP_S * SAMPLE_RATE)
            starts = []
            chunks = []
            pos = 0
            while pos == 0 or pos + win // 2 < len(audio):
                chunk = audio[pos : pos + win]
                if len(chunk) < win:
                    chunk = np.pad(chunk, (0, win - len(chunk)))
                starts.append(pos / SAMPLE_RATE)
                chunks.append(chunk)
                pos += step
                if pos + win >= len(audio) + step:
                    break
            # ONE batched forward for every sliding window
            scores = np.exp(
                np.asarray(
                    forward(
                        self._model, self._cfg, jnp.asarray(np.stack(chunks))
                    )
                )
            )
            speech = 1.0 - scores[:, :, 0]  # P(speech) = 1 - P(silence)
            # Overlapping windows (10 s stepped by 1 s) must be AGGREGATED
            # onto one monotonic frame grid — feeding each window's frames
            # sequentially would hand Binarize duplicated, non-monotonic
            # timestamps (pyannote averages overlapping windows too).
            n_f = speech.shape[1]
            frame_dur = self.WINDOW_S / n_f
            total = int(np.ceil(len(audio) / SAMPLE_RATE / frame_dur)) + 1
            acc = np.zeros(total)
            cover = np.zeros(total)
            for start_s, row in zip(starts, speech):
                f0 = int(round(start_s / frame_dur))
                hi = min(f0 + n_f, total)
                acc[f0:hi] += row[: hi - f0]
                cover[f0:hi] += 1.0
            valid = cover > 0
            frames = acc[valid] / cover[valid]
            times = (np.flatnonzero(valid) + 0.5) * frame_dur
            keep = times <= len(audio) / SAMPLE_RATE + frame_dur
            return frames[keep], times[keep]

        from whisperx_tpu.vad.energy import EnergyVAD

        probs = EnergyVAD().speech_probs(audio)
        times = (np.arange(len(probs)) + 0.5) * 512 / SAMPLE_RATE
        return probs, times

    def __call__(self, audio_dict, **options) -> List[SpeechSegment]:
        audio = np.asarray(audio_dict["waveform"], np.float32).reshape(-1)
        scores, times = self._frame_scores(audio)
        if len(scores) == 0:
            return []
        binarize = Binarize(
            onset=options.get("threshold", self.vad_onset),
            offset=self.vad_offset,
            max_duration=options.get("max_speech_duration_s", self.chunk_size),
            min_duration_on=0.0,
            min_duration_off=0.0,
        )
        segs = binarize(scores, times)
        return [SpeechSegment(max(0.0, s.start), min(len(audio) / SAMPLE_RATE, s.end)) for s in segs]
