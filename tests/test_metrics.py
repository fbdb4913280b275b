"""Structured metrics export (SURVEY §5.5): JSON-lines schema + wiring."""

import json
import time

import numpy as np

from tests.conftest import synth_speech
from whisperx_tpu.utils.metrics import GLOBAL_TRACKER, RTFTracker


def test_emit_jsonl_schema(tmp_path):
    t = RTFTracker()
    with t.track("decode", audio_seconds=30.0):
        time.sleep(0.01)
    with t.track("mel", audio_seconds=30.0):
        pass
    t.add("tokens_decoded", 120)
    t.add("batch_slots", 8)
    t.add("batch_used", 6)

    path = tmp_path / "metrics.jsonl"
    t.emit_jsonl(str(path), extra={"files": 1})
    lines = [json.loads(line) for line in open(path)]

    stages = [l for l in lines if l["event"] == "stage"]
    assert {s["stage"] for s in stages} == {"decode", "mel"}
    for s in stages:
        assert set(s) >= {"event", "stage", "calls", "total_s", "audio_s", "rtf"}

    summary = lines[-1]
    assert summary["event"] == "summary"
    assert summary["tokens_per_s"] > 0
    assert summary["batch_fill"] == 0.75
    assert summary["files"] == 1
    assert summary["rtf"] > 0


def test_pipeline_populates_stage_metrics(nano_model):
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.vad import EnergyVAD

    GLOBAL_TRACKER.reset()
    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=EnergyVAD(),
        asr_options={"temperatures": (0.0,), "sample_len": 6},
        language="en",
        batch_size=2,
    )
    pipe.transcribe(synth_speech(3.0))
    assert GLOBAL_TRACKER.counters["batch_slots"] > 0
    assert "decode" in GLOBAL_TRACKER.stages
    # every emitted line parses
    for line in GLOBAL_TRACKER.emit_jsonl().strip().split("\n"):
        json.loads(line)
