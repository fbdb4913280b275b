"""Observability: RTF counters, stage timers, and jax.profiler tracing.

The reference scatters ad-hoc time.time() RTF prints through its backends
(SURVEY.md §5.1); this module centralizes them and adds real device
profiling via ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class StageStats:
    calls: int = 0
    total_s: float = 0.0
    audio_s: float = 0.0

    @property
    def rtf(self) -> float:
        return self.audio_s / self.total_s if self.total_s > 0 else 0.0


@dataclass
class RTFTracker:
    """Per-stage wall-time + real-time-factor accounting."""

    stages: Dict[str, StageStats] = field(
        default_factory=lambda: defaultdict(StageStats)
    )

    @contextlib.contextmanager
    def track(self, stage: str, audio_seconds: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            s = self.stages[stage]
            s.calls += 1
            s.total_s += dt
            s.audio_s += audio_seconds

    def report(self) -> Dict[str, dict]:
        return {
            name: {
                "calls": s.calls,
                "total_s": round(s.total_s, 4),
                "audio_s": round(s.audio_s, 2),
                "rtf": round(s.rtf, 2),
            }
            for name, s in self.stages.items()
        }

    def dump(self, path: Optional[str] = None) -> str:
        text = json.dumps(self.report(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(text)
        return text


GLOBAL_TRACKER = RTFTracker()


@contextlib.contextmanager
def profiler_trace(log_dir: str = "/tmp/whisperx_tpu_trace"):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_report() -> Dict[str, dict]:
    from whisperx_tpu.pipeline.batch_processor import optimize_memory

    return optimize_memory()
