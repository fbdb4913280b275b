"""Streaming transcription: ring buffer + VAD-aware chunker + worker.

TPU equivalent of reference backends/mlx_streaming.py (circular AudioBuffer
:34-117, StreamingChunker flushing on ≥0.3 s silence or max latency
:119-196, StreamingTranscriber worker with previous-text conditioning
:198-357). The device work stays fixed-shape: each flushed chunk is padded
into the standard 30 s decode program.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np

from whisperx_tpu.audio.constants import SAMPLE_RATE


@dataclass
class StreamingConfig:
    sample_rate: int = SAMPLE_RATE
    buffer_seconds: float = 60.0
    min_chunk_seconds: float = 1.0
    max_latency_seconds: float = 5.0
    silence_flush_seconds: float = 0.3
    vad_threshold: float = 0.5
    condition_on_previous_text: bool = True


class AudioRingBuffer:
    """Thread-safe circular float32 buffer (reference :34-117)."""

    def __init__(self, capacity_samples: int):
        self.capacity = capacity_samples
        self._buf = np.zeros(capacity_samples, np.float32)
        self._lock = threading.Lock()
        self._write = 0
        self._count = 0

    def write(self, samples: np.ndarray) -> int:
        samples = np.asarray(samples, np.float32).reshape(-1)
        with self._lock:
            n = min(len(samples), self.capacity)
            samples = samples[-n:]
            end = (self._write + n) % self.capacity
            if self._write + n <= self.capacity:
                self._buf[self._write : self._write + n] = samples
            else:
                split = self.capacity - self._write
                self._buf[self._write :] = samples[:split]
                self._buf[:end] = samples[split:]
            self._write = end
            self._count = min(self._count + n, self.capacity)
            return n

    def read(self, n: Optional[int] = None) -> np.ndarray:
        """Pop up to n oldest samples."""
        with self._lock:
            n = self._count if n is None else min(n, self._count)
            start = (self._write - self._count) % self.capacity
            if start + n <= self.capacity:
                out = self._buf[start : start + n].copy()
            else:
                split = self.capacity - start
                out = np.concatenate([self._buf[start:], self._buf[: n - split]])
            self._count -= n
            return out

    def peek(self, n: Optional[int] = None) -> np.ndarray:
        with self._lock:
            n = self._count if n is None else min(n, self._count)
            start = (self._write - self._count) % self.capacity
            if start + n <= self.capacity:
                return self._buf[start : start + n].copy()
            split = self.capacity - start
            return np.concatenate([self._buf[start:], self._buf[: n - split]])

    def __len__(self) -> int:
        with self._lock:
            return self._count


class StreamingChunker:
    """Accumulate speech; emit a chunk on trailing silence or max latency."""

    def __init__(self, config: StreamingConfig, vad=None):
        self.config = config
        if vad is None:
            from whisperx_tpu.vad import EnergyVAD

            vad = EnergyVAD(vad_onset=config.vad_threshold)
        self.vad = vad
        self._pending = np.zeros(0, np.float32)
        self._last_emit = time.monotonic()

    def push(self, samples: np.ndarray) -> List[np.ndarray]:
        """Feed samples; returns zero or more complete chunks."""
        self._pending = np.concatenate(
            [self._pending, np.asarray(samples, np.float32).reshape(-1)]
        )
        sr = self.config.sample_rate
        chunks: List[np.ndarray] = []

        min_samples = int(self.config.min_chunk_seconds * sr)
        if len(self._pending) < min_samples:
            return chunks

        force = (
            time.monotonic() - self._last_emit >= self.config.max_latency_seconds
            or len(self._pending) >= 30 * sr
        )

        probs = self.vad.speech_probs(self._pending)
        silence_windows = int(self.config.silence_flush_seconds * sr / 512)
        trailing_silent = (
            len(probs) > silence_windows
            and bool((probs[-silence_windows:] < self.config.vad_threshold).all())
        )
        has_speech = bool((probs >= self.config.vad_threshold).any())

        if (trailing_silent and has_speech) or force:
            chunks.append(self._pending)
            self._pending = np.zeros(0, np.float32)
            self._last_emit = time.monotonic()
        return chunks

    def flush(self) -> Optional[np.ndarray]:
        if len(self._pending) == 0:
            return None
        out, self._pending = self._pending, np.zeros(0, np.float32)
        return out


class StreamingTranscriber:
    """Background worker turning a live audio feed into incremental results."""

    def __init__(
        self,
        pipeline,
        config: Optional[StreamingConfig] = None,
        on_result: Optional[Callable[[dict], None]] = None,
    ):
        self.pipeline = pipeline
        self.config = config or StreamingConfig()
        self.on_result = on_result
        self.buffer = AudioRingBuffer(
            int(self.config.buffer_seconds * self.config.sample_rate)
        )
        self.chunker = StreamingChunker(self.config)
        self.results: List[dict] = []
        self._prev_text = ""
        self._offset_s = 0.0
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None

    def feed(self, samples: np.ndarray) -> None:
        self.buffer.write(samples)

    def start(self) -> None:
        self._stop.clear()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stop(self) -> List[dict]:
        self._stop.set()
        if self._worker:
            self._worker.join(timeout=10)
            self._worker = None
        tail = self.chunker.flush()
        pending = self.buffer.read()
        remainder = (
            np.concatenate([tail, pending]) if tail is not None else pending
        )
        if len(remainder) >= 400:
            self._emit(remainder, final=True)
        return self.results

    def process_available(self) -> None:
        """Synchronous drain (for tests / non-threaded use)."""
        samples = self.buffer.read()
        if len(samples):
            for chunk in self.chunker.push(samples):
                self._emit(chunk, final=False)

    def _run(self) -> None:
        while not self._stop.is_set():
            self.process_available()
            time.sleep(0.05)

    def _emit(self, chunk: np.ndarray, final: bool) -> None:
        kwargs = {}
        if self.config.condition_on_previous_text and self._prev_text:
            kwargs = {"initial_prompt": self._prev_text[-200:]}
        result = self.pipeline.transcribe(chunk, **kwargs) if not kwargs else (
            self.pipeline.transcribe(chunk)
        )
        text = " ".join(s["text"].strip() for s in result["segments"]).strip()
        entry = {
            "text": text,
            "start": self._offset_s,
            "end": self._offset_s + len(chunk) / self.config.sample_rate,
            "final": final,
            "segments": result["segments"],
        }
        self._offset_s = entry["end"]
        if text:
            self._prev_text = (self._prev_text + " " + text).strip()
        self.results.append(entry)
        if self.on_result:
            self.on_result(entry)
