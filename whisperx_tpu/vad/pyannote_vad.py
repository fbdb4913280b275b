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
            frames, times = [], []
            pos = 0
            while pos == 0 or pos + win // 2 < len(audio):
                chunk = audio[pos : pos + win]
                if len(chunk) < win:
                    chunk = np.pad(chunk, (0, win - len(chunk)))
                scores = np.exp(
                    np.asarray(forward(self._model, self._cfg, jnp.asarray(chunk)[None]))
                )[0]
                # P(speech) = 1 - P(silence class 0)
                speech = 1.0 - scores[:, 0]
                t_frame = self.WINDOW_S / len(speech)
                for i, s in enumerate(speech):
                    t = pos / SAMPLE_RATE + (i + 0.5) * t_frame
                    if t <= (pos + win) / SAMPLE_RATE:
                        frames.append(s)
                        times.append(t)
                pos += step
                if pos + win >= len(audio) + step:
                    break
            return np.asarray(frames), np.asarray(times)

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
