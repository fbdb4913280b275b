"""JAX Whisper backends implementing the WhisperBackend contract.

Both wrap the same model + decode machinery (whisperx_tpu.decoding):

  - ``BatchedJAXBackend`` — chunked truly-batched greedy decode with
    batched temperature fallback; the fast default (role of the
    reference's SimpleMLXWhisperBackend/lightning paths, but actually
    batched on device).
  - ``SequentialJAXBackend`` — the full 30 s seek loop per audio
    (condition_on_previous_text, per-window fallback ladder, word
    timestamps); quality-maximal path (role of MlxWhisperBackend).
"""

from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

from whisperx_tpu.backends.base import WhisperBackend
from whisperx_tpu.types import TranscriptionResult
from whisperx_tpu.utils.languages import LANGUAGE_CODES


class _JAXBackendBase(WhisperBackend):
    def __init__(
        self,
        model: str,
        device: str = "tpu",
        device_index: int = 0,
        compute_type: str = "bfloat16",
        download_root: Optional[str] = None,
        local_files_only: bool = False,
        threads: int = 4,
        asr_options: Optional[dict] = None,
        language: Optional[str] = None,
        task: str = "transcribe",
        batch_size: int = 8,
        **kwargs,
    ):
        import jax.numpy as jnp

        from whisperx_tpu.models.whisper import load_model as load_whisper

        dtype = {"float32": jnp.float32}.get(compute_type, jnp.bfloat16)
        name = model
        if download_root:
            import os

            candidate = os.path.join(download_root, model)
            if os.path.isdir(candidate):
                name = candidate
        self.model = load_whisper(name, dtype=dtype)
        if compute_type in ("int8", "int4"):
            from whisperx_tpu.quant import quantize_model

            self.model = quantize_model(self.model, mode=compute_type)
        self.asr_options = asr_options or {}
        self.language = language
        self.task = task
        self.batch_size = batch_size

    @property
    def supported_languages(self) -> List[str]:
        if not self.is_multilingual:
            return ["en"]
        return list(LANGUAGE_CODES[: self.model.num_languages])

    @property
    def is_multilingual(self) -> bool:
        return self.model.is_multilingual

    def detect_language(self, audio: np.ndarray) -> str:
        from whisperx_tpu.asr import TranscriptionPipeline

        return TranscriptionPipeline(
            model=self.model, asr_options=self.asr_options
        ).detect_language(np.asarray(audio, np.float32))


class BatchedJAXBackend(_JAXBackendBase):
    def _pipeline(self, vad_model=None):
        from whisperx_tpu.asr import TranscriptionPipeline

        return TranscriptionPipeline(
            model=self.model,
            vad_model=vad_model,
            asr_options=self.asr_options,
            language=self.language,
            task=self.task,
            batch_size=self.batch_size,
        )

    def transcribe(
        self,
        audio: Union[str, np.ndarray],
        batch_size: Optional[int] = None,
        num_workers: int = 0,
        language: Optional[str] = None,
        task: Optional[str] = None,
        chunk_size: int = 30,
        print_progress: bool = False,
        combined_progress: bool = False,
        verbose: bool = False,
        **kwargs,
    ) -> TranscriptionResult:
        return self._pipeline().transcribe(
            audio,
            batch_size=batch_size or self.batch_size,
            chunk_size=chunk_size,
            language=language,
            task=task,
            print_progress=print_progress,
            verbose=verbose,
        )

    def transcribe_batch(
        self, segments: List[dict], batch_size: Optional[int] = None, **kwargs
    ) -> TranscriptionResult:
        """Decode pre-sliced VAD segments (each with an 'audio' key) as one
        device-batched call (contract: reference mlx_simple.transcribe_batch
        — which looped; this one actually batches)."""
        pipeline = self._pipeline()
        audio_parts = [np.asarray(s["audio"], np.float32) for s in segments]
        chunks = [
            {"start": s["start"], "end": s["end"], "segments": []}
            for s in segments
        ]
        # concatenate into a single timeline so the shared mel path applies
        total = int(max(s["end"] for s in segments) * 16000) if segments else 0
        audio = np.zeros(total, np.float32)
        for s, part in zip(segments, audio_parts):
            beg = int(s["start"] * 16000)
            audio[beg : beg + len(part)] = part[: max(0, total - beg)]
        language = self.language or (
            pipeline.detect_language(audio_parts[0]) if segments else "en"
        )
        segments_out = pipeline._transcribe_chunks(
            audio,
            chunks,
            batch_size=batch_size or self.batch_size,
            language=language,
            task=self.task,
        )
        return {"segments": segments_out, "language": language}


class SequentialJAXBackend(_JAXBackendBase):
    def transcribe(
        self,
        audio: Union[str, np.ndarray],
        batch_size: Optional[int] = None,
        num_workers: int = 0,
        language: Optional[str] = None,
        task: Optional[str] = None,
        chunk_size: int = 30,
        print_progress: bool = False,
        combined_progress: bool = False,
        verbose: bool = False,
        **kwargs,
    ) -> TranscriptionResult:
        from whisperx_tpu.decoding.transcribe import transcribe as seq_transcribe

        o = self.asr_options
        result = seq_transcribe(
            self.model,
            audio,
            language=language or self.language,
            task=task or self.task,
            verbose=verbose or None,
            temperature=o.get("temperatures", (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)),
            compression_ratio_threshold=o.get("compression_ratio_threshold", 2.4),
            logprob_threshold=o.get("log_prob_threshold", -1.0),
            no_speech_threshold=o.get("no_speech_threshold", 0.6),
            condition_on_previous_text=o.get("condition_on_previous_text", True),
            initial_prompt=o.get("initial_prompt"),
            word_timestamps=o.get("word_timestamps", False),
            hallucination_silence_threshold=o.get(
                "hallucination_silence_threshold"
            ),
        )
        return {
            "segments": [
                {k: s[k] for k in ("start", "end", "text")}
                | ({"words": s["words"]} if "words" in s else {})
                for s in result["segments"]
            ],
            "language": result["language"],
        }


def load_backend(kind: str = "batched", **kwargs) -> WhisperBackend:
    kind = (kind or "batched").lower()
    if kind in ("auto", "batched", "batch"):
        return BatchedJAXBackend(**kwargs)
    if kind in ("sequential", "standard"):
        return SequentialJAXBackend(**kwargs)
    raise ValueError(f"Unknown backend: {kind}")
