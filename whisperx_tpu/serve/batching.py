"""Continuous batching for transcription serving.

Host-side scheduler feeding fixed-shape padded device batches — the TPU
equivalent of reference backends/mlx_continuous_batching.py (priority
request queue :41-92, length bucketing :94-153, memory-aware splitting
:229-237, dynamic batch sizing :394-418). Bucketing maps directly onto
XLA's static-shape compilation model: each (bucket, batch) pair compiles
once and is reused forever.
"""

from __future__ import annotations

import heapq
import itertools
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np


@dataclass(order=True)
class TranscriptionRequest:
    priority: int
    seq: int = field(compare=True)
    audio: np.ndarray = field(compare=False, default=None)
    request_id: str = field(compare=False, default="")
    submitted_at: float = field(compare=False, default=0.0)
    callback: Optional[Callable] = field(compare=False, default=None)
    result: Any = field(compare=False, default=None)
    done: threading.Event = field(compare=False, default_factory=threading.Event)
    # per-request decode options (language/task); None = pipeline default
    language: Optional[str] = field(compare=False, default=None)
    task: Optional[str] = field(compare=False, default=None)


@dataclass
class BatchConfig:
    max_batch_size: int = 8
    min_batch_size: int = 1
    max_wait_ms: float = 100.0
    # duration bucket boundaries in seconds (reference :100-138)
    bucket_boundaries: tuple = (5.0, 10.0, 20.0, 30.0, 60.0)
    dynamic: bool = True


class RequestQueue:
    """Thread-safe priority queue (lower priority value = served first)."""

    def __init__(self):
        self._heap: List[TranscriptionRequest] = []
        self._cond = threading.Condition()
        self._counter = itertools.count()

    def put(self, request: TranscriptionRequest) -> None:
        with self._cond:
            heapq.heappush(self._heap, request)
            self._cond.notify()

    def get_batch(
        self, max_size: int, max_wait_s: float
    ) -> List[TranscriptionRequest]:
        """Block until at least one request, then drain up to max_size
        (waiting at most max_wait_s for stragglers).

        The straggler window is anchored at the OLDEST pending request's
        submission time, not at drain start: a request that already aged
        in the queue while the worker decoded the previous batch drains
        immediately (no second max_wait_s of added latency), while a
        concurrent burst — peers arriving within max_wait_s of the first
        submit — still coalesces."""
        with self._cond:
            while not self._heap:
                self._cond.wait()
            anchor = min(r.submitted_at for r in self._heap)
            deadline = anchor + max_wait_s
            while len(self._heap) < max_size:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cond.wait(timeout=remaining):
                    break
            batch = []
            while self._heap and len(batch) < max_size:
                batch.append(heapq.heappop(self._heap))
            return batch

    def __len__(self) -> int:
        with self._cond:
            return len(self._heap)


def bucket_requests(
    requests: List[TranscriptionRequest], boundaries
) -> Dict[int, List[TranscriptionRequest]]:
    """Group requests by duration bucket; sort within bucket by length so
    padded batches waste minimal compute (reference :100-138)."""
    from whisperx_tpu.audio.constants import SAMPLE_RATE

    buckets: Dict[int, List[TranscriptionRequest]] = {}
    for r in requests:
        dur = len(r.audio) / SAMPLE_RATE
        b = next(
            (i for i, bound in enumerate(boundaries) if dur <= bound),
            len(boundaries),
        )
        buckets.setdefault(b, []).append(r)
    for reqs in buckets.values():
        reqs.sort(key=lambda r: len(r.audio))
    return buckets


class DynamicBatchScheduler:
    """Adjust target batch size from queue depth (reference :394-418)."""

    def __init__(self, config: BatchConfig):
        self.config = config
        self.current = config.max_batch_size

    def update(self, queue_depth: int) -> int:
        if not self.config.dynamic:
            return self.config.max_batch_size
        if queue_depth >= 2 * self.config.max_batch_size:
            self.current = self.config.max_batch_size
        elif queue_depth <= self.config.min_batch_size:
            self.current = max(self.config.min_batch_size, queue_depth or 1)
        else:
            self.current = min(self.config.max_batch_size, queue_depth)
        return self.current


class ContinuousBatcher:
    """Serving loop: queue → bucketed padded batches → pooled decode.

    When ``pipeline`` exposes ``transcribe_many`` (TranscriptionPipeline
    does), chunks from ALL requests in a bucket share one decode stream —
    true cross-request coalescing, not per-request batching. Otherwise it
    falls back to per-request ``transcribe(audio, batch_size=...)``.
    """

    def __init__(self, pipeline, config: Optional[BatchConfig] = None):
        self.pipeline = pipeline
        self.config = config or BatchConfig()
        self.queue = RequestQueue()
        self.scheduler = DynamicBatchScheduler(self.config)
        self.stats = {
            "requests": 0,
            "batches": 0,
            "total_audio_s": 0.0,
            "total_wall_s": 0.0,
            "total_wait_s": 0.0,
        }
        self._seq = itertools.count()
        self._stop = threading.Event()
        self._worker: Optional[threading.Thread] = None

    # -- public API --------------------------------------------------------

    def submit(
        self,
        audio: np.ndarray,
        priority: int = 10,
        request_id: str = "",
        callback: Optional[Callable] = None,
        language: Optional[str] = None,
        task: Optional[str] = None,
    ) -> TranscriptionRequest:
        req = TranscriptionRequest(
            priority=priority,
            seq=next(self._seq),
            audio=np.asarray(audio, np.float32),
            request_id=request_id,
            submitted_at=time.monotonic(),
            callback=callback,
            language=language,
            task=task,
        )
        self.queue.put(req)
        return req

    def transcribe(self, audio: np.ndarray, timeout: Optional[float] = None,
                   language: Optional[str] = None, task: Optional[str] = None):
        req = self.submit(audio, language=language, task=task)
        if self._worker is None:
            self._drain_once()
        if not req.done.wait(timeout):
            raise TimeoutError("transcription request timed out")
        return req.result

    def start(self) -> None:
        if self._worker is None:
            self._stop.clear()
            self._worker = threading.Thread(target=self._run, daemon=True)
            self._worker.start()

    def stop(self) -> None:
        self._stop.set()
        if self._worker is not None:
            # unblock the queue wait
            self.submit(np.zeros(160, np.float32), priority=10**9, request_id="__stop__")
            self._worker.join(timeout=5)
            self._worker = None

    # -- internals ---------------------------------------------------------

    def _run(self) -> None:
        while not self._stop.is_set():
            self._drain_once()

    def _drain_once(self) -> None:
        # feed queue depth to the dynamic scheduler (stats / sizing signal),
        # but drain up to the CONFIG max: the depth is sampled BEFORE the
        # straggler wait, so under bursty concurrent arrivals it reads ~1
        # and would defeat coalescing entirely; max_wait_ms already bounds
        # the latency cost of waiting for peers
        self.scheduler.update(len(self.queue))
        batch = self.queue.get_batch(
            self.config.max_batch_size, self.config.max_wait_ms / 1000.0
        )
        batch = [r for r in batch if r.request_id != "__stop__"]
        if not batch:
            return
        buckets = bucket_requests(batch, self.config.bucket_boundaries)
        for reqs in buckets.values():
            t0 = time.monotonic()
            try:
                # NOTE: the DEVICE decode batch size is the pipeline's own
                # batch_size; max_batch_size only caps how many REQUESTS
                # coalesce per serving batch — don't conflate them here.
                if hasattr(self.pipeline, "transcribe_many"):
                    # cross-request coalescing: one pooled chunk stream
                    # fills shared device batches, results demuxed per
                    # request; per-request language/task ride along
                    results = self.pipeline.transcribe_many(
                        [r.audio for r in reqs],
                        language=[r.language for r in reqs],
                        task=[r.task for r in reqs],
                    )
                else:
                    results = [
                        self.pipeline.transcribe(
                            r.audio, language=r.language, task=r.task
                        )
                        for r in reqs
                    ]
            except Exception as e:
                # fail the batch's requests, never the worker thread: a bad
                # request (or transient decode error) must not hang every
                # later caller behind a dead worker
                err = {"error": f"{type(e).__name__}: {e}"}
                for req in reqs:
                    req.result = err
                    req.done.set()
                self.stats["errors"] = self.stats.get("errors", 0) + len(reqs)
                continue
            for req, result in zip(reqs, results):
                req.result = result
                req.done.set()
                if req.callback:
                    req.callback(result)
                self.stats["requests"] += 1
                self.stats["total_audio_s"] += len(req.audio) / 16000
                self.stats["total_wait_s"] += t0 - req.submitted_at
            self.stats["batches"] += 1
            self.stats["total_wall_s"] += time.monotonic() - t0

    @property
    def throughput_rtf(self) -> float:
        w = self.stats["total_wall_s"]
        return self.stats["total_audio_s"] / w if w > 0 else 0.0
