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
    # per-call extremes: warmup/compile calls and tunnel stalls hide in
    # totals; min_s is the steady-state cost, max_s the worst call
    min_s: float = float("inf")
    max_s: float = 0.0

    @property
    def rtf(self) -> float:
        return self.audio_s / self.total_s if self.total_s > 0 else 0.0


@dataclass
class RTFTracker:
    """Per-stage wall-time + real-time-factor accounting, plus free-form
    counters (tokens decoded, batch fill) for structured export."""

    stages: Dict[str, StageStats] = field(
        default_factory=lambda: defaultdict(StageStats)
    )
    counters: Dict[str, float] = field(
        default_factory=lambda: defaultdict(float)
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
            s.min_s = min(s.min_s, dt)
            s.max_s = max(s.max_s, dt)

    def add(self, counter: str, value: float = 1.0) -> None:
        self.counters[counter] += value

    def observe(self, stage: str, seconds: float, audio_seconds: float = 0.0) -> None:
        """Record an externally-timed interval against a stage."""
        s = self.stages[stage]
        s.calls += 1
        s.total_s += seconds
        s.audio_s += audio_seconds
        s.min_s = min(s.min_s, seconds)
        s.max_s = max(s.max_s, seconds)

    def reset(self) -> None:
        self.stages.clear()
        self.counters.clear()

    def report(self) -> Dict[str, dict]:
        # snapshot first: serving handler threads call this while pipeline
        # threads insert new stages (dict() is one C-level op, atomic
        # under the GIL; iterating the live dict could raise RuntimeError)
        return {
            name: {
                "calls": s.calls,
                "total_s": round(s.total_s, 4),
                "audio_s": round(s.audio_s, 2),
                "rtf": round(s.rtf, 2),
                "min_s": round(s.min_s, 4) if s.calls else 0.0,
                "max_s": round(s.max_s, 4),
            }
            for name, s in dict(self.stages).items()
        }

    def dump(self, path: Optional[str] = None) -> str:
        text = json.dumps(self.report(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(text)
        return text

    def emit_jsonl(self, path: Optional[str] = None, extra: Optional[dict] = None) -> str:
        """Structured metrics export (SURVEY §5.5 upgrade over the
        reference's print()-level reporting): one JSON line per stage plus
        a summary line with derived tokens/s and batch-fill ratios."""
        lines = []
        stages = dict(self.stages)  # snapshot (see report())
        for name, s in stages.items():
            lines.append(
                json.dumps(
                    {
                        "event": "stage",
                        "stage": name,
                        "calls": s.calls,
                        "total_s": round(s.total_s, 4),
                        "audio_s": round(s.audio_s, 2),
                        "rtf": round(s.rtf, 2),
                        # per-call extremes: warmup compiles / stalls are
                        # separable from steady state in the export too
                        "min_s": round(s.min_s, 4) if s.calls else 0.0,
                        "max_s": round(s.max_s, 4),
                    }
                )
            )
        total_s = sum(s.total_s for s in stages.values())
        audio_s = max((s.audio_s for s in stages.values()), default=0.0)
        summary = {
            "event": "summary",
            "total_s": round(total_s, 4),
            "audio_s": round(audio_s, 2),
            "rtf": round(audio_s / total_s, 2) if total_s > 0 else 0.0,
        }
        decode = stages.get("decode")
        if self.counters.get("tokens_decoded") and decode and decode.total_s > 0:
            summary["tokens_per_s"] = round(
                self.counters["tokens_decoded"] / decode.total_s, 1
            )
        if self.counters.get("batch_slots"):
            summary["batch_fill"] = round(
                self.counters["batch_used"] / self.counters["batch_slots"], 3
            )
        summary.update(extra or {})
        lines.append(json.dumps(summary))
        text = "\n".join(lines) + "\n"
        if path:
            with open(path, "a") as f:
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
