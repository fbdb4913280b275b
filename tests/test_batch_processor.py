"""Batch processor, batched VAD, and metrics tests."""

import numpy as np

from whisperx_tpu.pipeline.batch_processor import (
    BatchProcessor,
    MemoryEfficientProcessor,
    optimize_memory,
)
from whisperx_tpu.utils.metrics import RTFTracker
from whisperx_tpu.vad.batch import BatchVADProcessor


def test_chunking_short_segment_passthrough():
    bp = BatchProcessor(chunk_duration=30.0)
    audio = np.zeros(16000 * 20, np.float32)
    chunks = bp.chunk_segments(audio, [{"start": 1.0, "end": 11.0}])
    assert len(chunks) == 1
    assert chunks[0].start == 1.0 and chunks[0].end == 11.0
    assert not chunks[0].is_continuation


def test_chunking_long_segment_with_overlap():
    bp = BatchProcessor(chunk_duration=10.0, overlap_duration=0.5)
    audio = np.zeros(16000 * 35, np.float32)
    chunks = bp.chunk_segments(audio, [{"start": 0.0, "end": 35.0}])
    assert len(chunks) == 4
    assert all(c.end - c.start <= 10.0 + 1e-6 for c in chunks)
    assert chunks[0].is_continuation is False
    assert all(c.is_continuation for c in chunks[1:])
    # consecutive chunks overlap by 0.5 s
    for a, b in zip(chunks, chunks[1:]):
        assert abs(a.end - b.start - 0.5) < 1e-6
    # full coverage
    assert chunks[-1].end == 35.0


def test_batch_grouping_and_padding():
    bp = BatchProcessor(chunk_duration=5.0, batch_size=2)
    audio = np.ones(16000 * 12, np.float32)
    chunks = bp.chunk_segments(audio, [{"start": 0.0, "end": 12.0}])
    batches = bp.group_batches(chunks)
    assert sum(len(b) for b in batches) == len(chunks)
    padded = bp.pad_batch(batches[0])
    assert padded.shape == (len(batches[0]), 5 * 16000)


def test_overlap_text_merge_drops_leading_words():
    texts = ["one two three four five", "four five six seven eight"]
    merged = BatchProcessor.merge_chunk_texts(texts, [False, True])
    assert merged.startswith("one two three four five")
    assert "six seven eight" in merged
    # the dropped overlap words aren't duplicated at the join
    assert merged.split().count("four") == 1 or merged.split().count("five") <= 2


def test_memory_efficient_preset():
    mp = MemoryEfficientProcessor()
    assert mp.chunk_duration == 15.0 and mp.batch_size == 4


def test_optimize_memory_returns_dict():
    assert isinstance(optimize_memory(), dict)


def test_batch_vad_multiple_streams(speech_5s):
    proc = BatchVADProcessor()
    silent = np.zeros(16000 * 2, np.float32)
    results = proc.process_batch([speech_5s, silent, speech_5s[:16000]])
    assert len(results) == 3
    assert proc.stats["batches"] == 1
    # results structurally valid (random LSTM weights: content unchecked)
    for segs in results:
        for s in segs:
            assert s.end > s.start >= 0


def test_rtf_tracker():
    tracker = RTFTracker()
    with tracker.track("asr", audio_seconds=30.0):
        pass
    rep = tracker.report()
    assert rep["asr"]["calls"] == 1
    assert rep["asr"]["audio_s"] == 30.0
    assert "asr" in tracker.dump()


def test_batch_vad_padding_does_not_skew_short_streams(speech_5s):
    """Energy-VAD stats are per-stream at TRUE length: a short clip batched
    with a much longer one must segment identically to a solo pass (zero
    padding must not shift its adaptive speech/noise threshold)."""
    proc = BatchVADProcessor()
    short = speech_5s[:16000]  # 1 s of speech, padded to 5 s in the batch
    solo = proc.process_batch([short])[0]
    batched = proc.process_batch([speech_5s, short])[1]
    assert [(s.start, s.end) for s in batched] == [
        (s.start, s.end) for s in solo
    ]
    for s in batched:  # never report speech inside the padded tail
        assert s.end <= 1.0 + 0.1


def test_batch_vad_zero_length_stream(speech_5s):
    """An empty stream batched with real ones yields no segments instead of
    crashing the whole batch (regression: percentile over a zero-size
    energy array raised IndexError)."""
    proc = BatchVADProcessor()
    results = proc.process_batch([speech_5s, np.zeros(0, np.float32)])
    assert len(results) == 2
    assert results[1] == []
    assert len(results[0]) >= 1  # the real stream still segments


def test_batch_vad_all_empty():
    proc = BatchVADProcessor()
    results = proc.process_batch([np.zeros(0, np.float32)] * 2)
    assert results == [[], []]
