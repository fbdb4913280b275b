"""Serving layer tests: ring buffer, chunker, request queue, batcher."""

import threading
import time

import numpy as np
import pytest

from whisperx_tpu.serve import (
    AudioRingBuffer,
    BatchConfig,
    ContinuousBatcher,
    RequestQueue,
    StreamingChunker,
    StreamingConfig,
    StreamingTranscriber,
    TranscriptionRequest,
    bucket_requests,
)


class FakePipeline:
    def __init__(self):
        self.calls = []

    def transcribe(self, audio, batch_size=8, **kw):
        self.calls.append(len(audio))
        return {
            "segments": [{"start": 0.0, "end": len(audio) / 16000, "text": "ok"}],
            "language": "en",
        }


def test_ring_buffer_wraparound():
    buf = AudioRingBuffer(100)
    buf.write(np.arange(60, dtype=np.float32))
    assert len(buf) == 60
    out = buf.read(50)
    assert out.tolist() == list(range(50))
    buf.write(np.arange(100, 180, dtype=np.float32))  # wraps
    assert len(buf) == 90
    out = buf.read()
    assert out[:10].tolist() == list(range(50, 60))
    assert out[10:].tolist() == list(range(100, 180))


def test_ring_buffer_overflow_keeps_newest():
    buf = AudioRingBuffer(10)
    buf.write(np.arange(25, dtype=np.float32))
    assert buf.read().tolist() == list(range(15, 25))


def test_ring_buffer_peek_does_not_consume():
    buf = AudioRingBuffer(10)
    buf.write(np.arange(5, dtype=np.float32))
    assert buf.peek().tolist() == [0, 1, 2, 3, 4]
    assert len(buf) == 5


def test_request_queue_priority_order():
    q = RequestQueue()
    for prio, rid in [(5, "b"), (1, "a"), (9, "c")]:
        q.put(
            TranscriptionRequest(
                priority=prio, seq=prio, audio=np.zeros(10), request_id=rid
            )
        )
    batch = q.get_batch(3, 0.01)
    assert [r.request_id for r in batch] == ["a", "b", "c"]


def test_request_queue_aged_request_drains_immediately():
    """The straggler window anchors at the oldest pending SUBMISSION, not
    at drain start: a request that already waited (worker busy with the
    previous batch) must not pay another full max_wait_s."""
    import time as _time

    q = RequestQueue()
    req = TranscriptionRequest(
        priority=5, seq=0, audio=np.zeros(10), request_id="aged",
        submitted_at=_time.monotonic() - 1.0,  # aged past the 0.2 s window
    )
    q.put(req)
    t0 = _time.monotonic()
    batch = q.get_batch(8, max_wait_s=0.2)
    elapsed = _time.monotonic() - t0
    assert [r.request_id for r in batch] == ["aged"]
    assert elapsed < 0.15, f"aged request waited {elapsed:.2f}s for stragglers"


def test_request_queue_fresh_burst_still_coalesces():
    """Peers arriving within the window of the first submit coalesce."""
    import threading as _threading
    import time as _time

    q = RequestQueue()
    q.put(TranscriptionRequest(
        priority=5, seq=0, audio=np.zeros(10), request_id="first",
        submitted_at=_time.monotonic(),
    ))

    def late_peer():
        _time.sleep(0.1)
        q.put(TranscriptionRequest(
            priority=5, seq=1, audio=np.zeros(10), request_id="peer",
            submitted_at=_time.monotonic(),
        ))

    t = _threading.Thread(target=late_peer)
    t.start()
    batch = q.get_batch(2, max_wait_s=2.0)
    t.join()
    assert sorted(r.request_id for r in batch) == ["first", "peer"]


def test_bucket_requests_by_duration():
    reqs = [
        TranscriptionRequest(0, i, audio=np.zeros(int(d * 16000)))
        for i, d in enumerate([2.0, 8.0, 25.0, 3.0])
    ]
    buckets = bucket_requests(reqs, (5.0, 10.0, 20.0, 30.0))
    durations = {
        b: sorted(len(r.audio) / 16000 for r in rs) for b, rs in buckets.items()
    }
    assert durations[0] == [2.0, 3.0]
    assert durations[1] == [8.0]
    assert durations[3] == [25.0]


def test_request_queue_initial_wait_returns_empty():
    """The workerless inline-drain path must never block forever on an
    empty queue (a concurrent caller may have drained this thread's
    request into its own batch)."""
    q = RequestQueue()
    t0 = time.monotonic()
    assert q.get_batch(4, 0.01, initial_wait_s=0.05) == []
    assert time.monotonic() - t0 < 1.0


def test_workerless_concurrent_transcribe_no_deadlock():
    """Two workerless callers: one drains BOTH requests; the other must
    get its result instead of blocking forever inside get_batch."""
    pipe = FakePipeline()
    # wide straggler window so the first drainer coalesces both requests
    batcher = ContinuousBatcher(pipe, BatchConfig(max_wait_ms=300))
    results = {}

    def call(name):
        results[name] = batcher.transcribe(
            np.zeros(16000, np.float32), timeout=30
        )

    threads = [threading.Thread(target=call, args=(n,)) for n in "ab"]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
        assert not t.is_alive(), "workerless caller deadlocked"
    assert results["a"]["segments"] and results["b"]["segments"]


def test_stop_timeout_keeps_serving_inline():
    """stop() whose join times out (worker stuck mid-decode, e.g. a
    first-call compile) must not wedge transcribe(): with the stop
    requested, callers fall back to inline draining."""
    entered = threading.Event()
    release = threading.Event()
    calls = []

    class SlowPipeline:
        def transcribe(self, audio, batch_size=8, **kw):
            calls.append(len(audio))
            if len(calls) == 1:  # first batch blocks like a long compile
                entered.set()
                release.wait(10)
            return {
                "segments": [{"start": 0.0, "end": 1.0, "text": "ok"}],
                "language": "en",
            }

    batcher = ContinuousBatcher(
        SlowPipeline(), BatchConfig(max_wait_ms=5, stop_join_s=0.1)
    )
    batcher.start()
    req_a = batcher.submit(np.zeros(16000, np.float32))
    assert entered.wait(10)
    batcher.stop()  # join times out; worker is still mid-decode
    t0 = time.monotonic()
    r = batcher.transcribe(np.zeros(8000, np.float32), timeout=10)
    assert r["segments"][0]["text"] == "ok"
    assert time.monotonic() - t0 < 5, "caller parked behind the dying worker"
    release.set()
    assert req_a.done.wait(10)  # the stuck batch still completes
    batcher.start()  # joins the wound-down worker, spawns a fresh one
    batcher.stop()


def test_stop_then_start_single_worker():
    """A stop()/start() cycle must leave exactly one live worker: the new
    worker gets a FRESH stop event, so clearing it cannot revive the old
    loop, and start() waits out a still-exiting worker."""
    pipe = FakePipeline()
    batcher = ContinuousBatcher(pipe, BatchConfig(max_wait_ms=5))
    batcher.start()
    first = batcher._worker
    batcher.stop()
    batcher.start()
    second = batcher._worker
    assert second is not first and second.is_alive()
    assert not first.is_alive()
    r = batcher.transcribe(np.zeros(8000, np.float32), timeout=20)
    assert r["segments"][0]["text"] == "ok"
    batcher.stop()


def test_continuous_batcher_sync():
    pipe = FakePipeline()
    batcher = ContinuousBatcher(pipe, BatchConfig(max_wait_ms=5))
    result = batcher.transcribe(np.zeros(16000, np.float32), timeout=10)
    assert result["segments"][0]["text"] == "ok"
    assert batcher.stats["requests"] == 1


def test_continuous_batcher_threaded():
    pipe = FakePipeline()
    batcher = ContinuousBatcher(pipe, BatchConfig(max_wait_ms=5))
    batcher.start()
    reqs = [batcher.submit(np.zeros(8000, np.float32)) for _ in range(5)]
    for r in reqs:
        assert r.done.wait(timeout=20)
    batcher.stop()
    assert batcher.stats["requests"] >= 5


def test_streaming_chunker_flushes_on_silence(speech_5s):
    cfg = StreamingConfig(min_chunk_seconds=0.5, max_latency_seconds=60.0)
    chunker = StreamingChunker(cfg)
    audio = np.concatenate([speech_5s[:32000], np.zeros(16000, np.float32)])
    chunks = chunker.push(audio)
    assert len(chunks) == 1
    assert len(chunks[0]) == len(audio)


def test_streaming_chunker_splits_bursty_push_at_30s(speech_5s):
    """A whole-file burst landing in one push must come out as ≤30 s
    pieces: an arbitrary-length chunk would hit a padding bucket no
    warmup compiled, stalling the live stream mid-utterance."""
    cfg = StreamingConfig(min_chunk_seconds=0.5, max_latency_seconds=60.0)
    chunker = StreamingChunker(cfg)
    sr = cfg.sample_rate
    burst = np.concatenate([np.tile(speech_5s, 13), np.zeros(16000, np.float32)])
    assert len(burst) > 2 * 30 * sr  # 65 s + trailing silence
    chunks = chunker.push(burst)
    assert len(chunks) == 3
    assert all(len(c) <= 30 * sr for c in chunks)
    assert sum(len(c) for c in chunks) == len(burst)
    np.testing.assert_array_equal(np.concatenate(chunks), burst)


def test_streaming_transcriber_sync(speech_5s):
    pipe = FakePipeline()
    st = StreamingTranscriber(
        pipe, StreamingConfig(min_chunk_seconds=0.5, max_latency_seconds=0.0)
    )
    st.feed(speech_5s[:16000])
    st.process_available()
    results = st.stop()
    assert results
    assert results[-1]["end"] > 0


def test_max_latency_flush_without_new_feed(speech_5s):
    """Regression: buffered audio must force-flush after max_latency even
    if the client never feeds again (the wall-clock gate lives inside
    chunker.push, so process_available must keep calling it while audio
    is pending — a feed-once-then-wait WebSocket client hung forever)."""
    pipe = FakePipeline()
    st = StreamingTranscriber(
        pipe, StreamingConfig(min_chunk_seconds=0.5, max_latency_seconds=5.0)
    )
    st.feed(speech_5s[:32000])
    st.process_available()  # buffers; neither silence nor latency yet
    assert not st.results
    # simulate max_latency elapsing with NO new samples arriving
    st.chunker._last_emit -= 6.0
    st.process_available()
    assert st.results and st.results[-1]["end"] == pytest.approx(2.0)


class FakeCoalescingPipeline(FakePipeline):
    def __init__(self):
        super().__init__()
        self.many_calls = []

    def transcribe_many(self, audios, batch_size=8, **kw):
        self.many_calls.append(len(audios))
        return [
            {
                "segments": [
                    {"start": 0.0, "end": len(a) / 16000, "text": f"len{len(a)}"}
                ],
                "language": "en",
            }
            for a in audios
        ]


def test_batcher_coalesces_across_requests():
    """Concurrent requests in one bucket go through ONE transcribe_many
    call with per-request result demux (not N transcribe calls)."""
    pipe = FakeCoalescingPipeline()
    batcher = ContinuousBatcher(pipe, BatchConfig(max_wait_ms=200))
    # enqueue all four BEFORE the worker starts: one drain, one bucket
    reqs = [
        batcher.submit(np.zeros(16000 + i, np.float32)) for i in range(4)
    ]
    batcher.start()
    for r in reqs:
        assert r.done.wait(timeout=20)
    batcher.stop()
    assert pipe.calls == []  # per-request path never used
    assert pipe.many_calls[0] == 4  # first drain coalesced all four
    for r in reqs:  # each request got ITS OWN result back
        assert r.result["segments"][0]["text"] == f"len{len(r.audio)}"


def test_transcribe_many_coalesces_device_batches(nano_model, monkeypatch):
    """4 single-chunk requests at batch_size 8 must decode in ONE device
    batch, and segments must demux to per-request local times."""
    import whisperx_tpu.asr as asr_mod
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.decoding import get_tokenizer
    from whisperx_tpu.decoding.decode import DecodingResult
    from whisperx_tpu.utils.metrics import GLOBAL_TRACKER
    from whisperx_tpu.vad.types import SpeechSegment

    tok = get_tokenizer(True, language="en")
    tb = tok.timestamp_begin
    tokens = [tb, *tok.encode(" hi"), tb + 50]

    decode_calls = []

    def fake_decode(model, mel, opts, **kw):
        decode_calls.append(mel.shape[0])
        return [
            DecodingResult(
                audio_features=None,
                language="en",
                tokens=list(tokens),
                text="hi",
                avg_logprob=-0.1,
                no_speech_prob=0.0,
                temperature=0.0,
                compression_ratio=1.0,
            )
            for _ in range(mel.shape[0])
        ]

    def fake_dispatch(model, mel, opts, **kw):
        return {"done": fake_decode(model, mel, opts, **kw)}

    monkeypatch.setattr(asr_mod, "decode_dispatch", fake_dispatch)

    class StubVAD:
        vad_onset = 0.5
        vad_offset = 0.363

        def __call__(self, inp, max_speech_duration_s=30):
            dur = len(inp["waveform"]) / inp["sample_rate"]
            return [SpeechSegment(start=1.0, end=min(7.0, dur))]

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=StubVAD(),
        asr_options={
            "temperatures": (0.0,),
            "no_speech_threshold": None,
            "log_prob_threshold": None,
            "compression_ratio_threshold": None,
        },
        language="en",
        batch_size=8,
    )
    audios = [np.zeros(16000 * 8, np.float32) for _ in range(4)]
    results = pipe.transcribe_many(audios)
    assert len(decode_calls) == 1  # ONE pooled device batch, not 4
    assert len(results) == 4
    for res in results:
        assert len(res["segments"]) == 1
        seg = res["segments"][0]
        # window starts at the request-local chunk start (1.0 s)
        assert seg["start"] == 1.0 and seg["end"] == 2.0
        assert seg["text"] == "hi"


def test_transcribe_many_per_request_language(nano_model, monkeypatch):
    """A French and an English request sharing the batcher each keep their
    own detected language: detection runs per request, decode groups by
    language, and each result carries its request's language."""
    import whisperx_tpu.asr as asr_mod
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.decoding.decode import DecodingResult
    from whisperx_tpu.vad.types import SpeechSegment

    from whisperx_tpu.decoding import get_tokenizer as _gt

    _tok = _gt(True, language="en")
    langs_used = []

    def fake_dispatch(model, mel, opts, **kw):
        langs_used.append(opts.language)
        return {
            "done": [
                DecodingResult(
                    audio_features=None,
                    language=opts.language,
                    tokens=list(_tok.encode(" bonjour" if opts.language == "fr" else " hello")),
                    text="bonjour" if opts.language == "fr" else "hello",
                    avg_logprob=-0.1,
                    no_speech_prob=0.0,
                    temperature=0.0,
                    compression_ratio=1.0,
                )
                for _ in range(mel.shape[0])
            ]
        }

    monkeypatch.setattr(asr_mod, "decode_dispatch", fake_dispatch)

    # transcribe_many detects ALL undetected requests in ONE batched call
    detect_calls = []

    def fake_detect(model, mels, tok):
        detect_calls.append(int(mels.shape[0]))
        codes = ["fr", "en"][: mels.shape[0]]
        return codes, [None] * len(codes)

    monkeypatch.setattr(asr_mod, "_detect_language", fake_detect)

    class StubVAD:
        vad_onset = 0.5
        vad_offset = 0.363

        def __call__(self, inp, max_speech_duration_s=30):
            dur = len(inp["waveform"]) / inp["sample_rate"]
            return [SpeechSegment(start=0.5, end=min(6.0, dur))]

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=StubVAD(),
        asr_options={
            "temperatures": (0.0,),
            "no_speech_threshold": None,
            "log_prob_threshold": None,
            "compression_ratio_threshold": None,
            "without_timestamps": True,
        },
        language=None,  # force per-request detection
        batch_size=8,
    )
    audios = [np.zeros(16000 * 7, np.float32) for _ in range(2)]
    results = pipe.transcribe_many(audios)
    assert sorted(langs_used) == ["en", "fr"]  # one decode group per language
    assert detect_calls == [2]  # ONE batched detection call for both requests
    assert results[0]["language"] == "fr"
    assert results[1]["language"] == "en"
    assert "bonjour" in results[0]["segments"][0]["text"]
    assert "hello" in results[1]["segments"][0]["text"]


def test_transcribe_many_per_request_initial_prompt(nano_model, monkeypatch):
    """Per-request initial_prompt LISTS: the prompt conditions the decode
    prefix, so prompted and unprompted requests decode in separate
    groups, and the prompt tokens reach DecodingOptions."""
    import whisperx_tpu.asr as asr_mod
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.decoding import get_tokenizer as _gt
    from whisperx_tpu.decoding.decode import DecodingResult
    from whisperx_tpu.vad.types import SpeechSegment

    _tok = _gt(True, language="en")
    prompts_used = []

    def fake_dispatch(model, mel, opts, **kw):
        prompts_used.append(opts.prompt)
        return {
            "done": [
                DecodingResult(
                    audio_features=None, language=opts.language,
                    tokens=list(_tok.encode(" x")), text="x",
                    avg_logprob=-0.1, no_speech_prob=0.0,
                    temperature=0.0, compression_ratio=1.0,
                )
                for _ in range(mel.shape[0])
            ]
        }

    monkeypatch.setattr(asr_mod, "decode_dispatch", fake_dispatch)

    class StubVAD:
        vad_onset = 0.5
        vad_offset = 0.363

        def __call__(self, inp, max_speech_duration_s=30):
            dur = len(inp["waveform"]) / inp["sample_rate"]
            return [SpeechSegment(start=0.5, end=min(6.0, dur))]

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=StubVAD(),
        asr_options={
            "temperatures": (0.0,),
            "no_speech_threshold": None,
            "log_prob_threshold": None,
            "compression_ratio_threshold": None,
            "without_timestamps": True,
        },
        language="en",
        batch_size=8,
    )
    audios = [np.zeros(16000 * 7, np.float32) for _ in range(2)]
    results = pipe.transcribe_many(
        audios, initial_prompt=["glossary: TPU, XLA", None]
    )
    assert len(prompts_used) == 2  # one decode group per distinct prompt
    with_prompt = [p for p in prompts_used if p]
    assert len(with_prompt) == 1
    assert list(with_prompt[0]) == list(
        _tok.encode(" " + "glossary: TPU, XLA")
    )
    assert all(len(r["segments"]) == 1 for r in results)


def test_transcribe_many_explicit_per_request_options(nano_model, monkeypatch):
    """Explicit per-request language/task LISTS: decode groups by
    (language, task) and no detection runs for explicit entries."""
    import whisperx_tpu.asr as asr_mod
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.decoding import get_tokenizer as _gt
    from whisperx_tpu.decoding.decode import DecodingResult
    from whisperx_tpu.vad.types import SpeechSegment

    _tok = _gt(True, language="en")
    groups_used = []

    def fake_dispatch(model, mel, opts, **kw):
        groups_used.append((opts.language, opts.task))
        return {
            "done": [
                DecodingResult(
                    audio_features=None, language=opts.language,
                    tokens=list(_tok.encode(" x")), text="x",
                    avg_logprob=-0.1, no_speech_prob=0.0,
                    temperature=0.0, compression_ratio=1.0,
                )
                for _ in range(mel.shape[0])
            ]
        }

    monkeypatch.setattr(asr_mod, "decode_dispatch", fake_dispatch)

    def boom(self, a):  # detection must not run for explicit languages
        raise AssertionError("detect_language called")

    monkeypatch.setattr(TranscriptionPipeline, "detect_language", boom)

    class StubVAD:
        vad_onset = 0.5
        vad_offset = 0.363

        def __call__(self, inp, max_speech_duration_s=30):
            dur = len(inp["waveform"]) / inp["sample_rate"]
            return [SpeechSegment(start=0.5, end=min(6.0, dur))]

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=StubVAD(),
        asr_options={
            "temperatures": (0.0,),
            "no_speech_threshold": None,
            "log_prob_threshold": None,
            "compression_ratio_threshold": None,
            "without_timestamps": True,
        },
        language=None,
        batch_size=8,
    )
    audios = [np.zeros(16000 * 7, np.float32) for _ in range(3)]
    results = pipe.transcribe_many(
        audios,
        language=["fr", "en", "fr"],
        task=["transcribe", "transcribe", "translate"],
    )
    # three distinct (language, task) groups → three decode calls
    assert sorted(groups_used) == [
        ("en", "transcribe"), ("fr", "transcribe"), ("fr", "translate")
    ]
    assert [r["language"] for r in results] == ["fr", "en", "fr"]
    # length-mismatched list raises
    with pytest.raises(ValueError):
        pipe.transcribe_many(audios, language=["fr"])


def test_streaming_partials_arrive_before_stream_end(nano_model):
    """VERDICT r2 Missing #5: with partial_interval_seconds set, PROVISIONAL
    results are emitted while the utterance is still growing — before any
    silence flush and before stop() — each carrying a latency measurement,
    and committed (stable) tokens only ever extend."""
    from tests.conftest import synth_speech
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.vad import load_vad_model

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=load_vad_model("energy"),
        asr_options={"temperatures": (0.0,), "sample_len": 8},
        language="en",
    )
    st = StreamingTranscriber(
        pipe,
        StreamingConfig(
            min_chunk_seconds=0.25,
            max_latency_seconds=1e9,  # never force-flush
            partial_interval_seconds=1.0,
        ),
    )
    speech = synth_speech(4.0, seed=6)
    seen_during_stream = []
    st.on_result = seen_during_stream.append
    step = 8000  # 0.5 s pieces, continuous speech: no silence flush
    for i in range(0, len(speech), step):
        st.feed(speech[i : i + step])
        st.process_available()
    assert seen_during_stream, "no result arrived before stream end"
    partials = [r for r in seen_during_stream if r["provisional"]]
    assert partials, "no provisional partial arrived before stream end"
    assert all("latency_s" in r and r["latency_s"] >= 0 for r in seen_during_stream)
    results = st.stop()
    finals = [r for r in results if not r.get("provisional")]
    assert finals and finals[-1]["final"]
    stats = st.latency_stats()
    assert "partial_mean_s" in stats and "first_result_s" in stats


def test_incremental_decoder_stable_prefix_monotone(nano_model):
    """LocalAgreement commits only tokens two consecutive partials agree
    on, and the committed prefix never shrinks or mutates."""
    from tests.conftest import synth_speech
    from whisperx_tpu.serve.streaming import IncrementalUtteranceDecoder

    dec = IncrementalUtteranceDecoder(nano_model, language="en")
    audio = synth_speech(5.0, seed=8)
    prev_stable = []
    for end_s in (2.0, 3.0, 3.5, 4.0):
        info = dec.partial(audio[: int(end_s * 16000)])
        stable = info["stable_tokens"]
        assert stable == info["tokens"][: len(stable)]
        assert stable[: len(prev_stable)] == prev_stable  # never rewritten
        prev_stable = stable
    # decoding identical audio again commits (at least) everything the two
    # identical hypotheses agree on — the stable prefix must grow
    info = dec.partial(audio[: int(4.0 * 16000)])
    assert len(info["stable_tokens"]) > len(prev_stable)
    assert info["stable_tokens"][: len(prev_stable)] == prev_stable


def test_incremental_decoder_prefix_outgrows_budget(nano_model):
    """Committed prefix growing past the token budget must not drive the
    decode's sample_len negative (chip regression: stable reached 128 on a
    64-token budget and the prefill overran the KV cache)."""
    from tests.conftest import synth_speech
    from whisperx_tpu.serve.streaming import IncrementalUtteranceDecoder

    dec = IncrementalUtteranceDecoder(nano_model, language="en", token_budget=48)
    audio = synth_speech(4.0, seed=9)
    prev = []
    for _ in range(6):  # identical audio → agreement → stable grows
        info = dec.partial(audio)
        assert info["stable_tokens"][: len(prev)] == prev
        prev = info["stable_tokens"]
    assert len(prev) > 16  # it DID commit across the bucket boundary


def test_incremental_decoder_budget_below_bucket(nano_model):
    """token_budget below PREFIX_BUCKET (32): nothing is replayed, never a
    negative slice / negative sample_len (regression: stable[:-32] and
    sample_len<0 once the prefix grew past 48)."""
    from tests.conftest import synth_speech
    from whisperx_tpu.serve.streaming import IncrementalUtteranceDecoder

    dec = IncrementalUtteranceDecoder(nano_model, language="en", token_budget=16)
    audio = synth_speech(4.0, seed=11)
    for _ in range(4):
        info = dec.partial(audio)  # must not raise
        assert len(info["tokens"]) <= 64


def test_streaming_final_decodes_bucket_to_whole_seconds(speech_5s):
    """Flushed chunks are padded to a whole-second grid before decoding:
    ragged lengths would each compile a fresh XLA program for the
    upload/VAD/mel stages, compile-storming long-lived streams. Entry
    timestamps still reflect the TRUE chunk length."""
    pipe = FakePipeline()
    st = StreamingTranscriber(
        pipe,
        StreamingConfig(min_chunk_seconds=0.2, max_latency_seconds=1.0),
    )
    st.feed(speech_5s[: int(16000 * 2.37)])  # ragged: 2.37 s
    st.process_available()
    results = st.stop()
    assert pipe.calls, "no decode ran"
    assert all(n % 16000 == 0 for n in pipe.calls), (
        f"unbucketed decode lengths: {pipe.calls}"
    )
    # bookkeeping uses the true length: ends cover exactly the fed audio
    assert results and abs(results[-1]["end"] - 2.37) < 0.05


def test_streaming_prompt_tokens_fixed_length(nano_model):
    """Prev-text prompts reach the decode as EXACTLY PROMPT_TOKENS token
    ids once enough text has accumulated (every distinct prompt length is
    a distinct ~45 MB decode program; raw text prompts recompiled per
    flush) — and as None before the window fills."""

    class ModelPipeline:
        model = nano_model

        def transcribe(self, audio, **kw):
            return {"segments": [], "language": "en"}

    st = StreamingTranscriber(ModelPipeline(), StreamingConfig())
    st._prev_text = "short"
    assert st._prompt_tokens() is None  # below the window: no prompt yet
    st._prev_text = " ".join(["conditioning"] * 60)
    toks = st._prompt_tokens()
    assert isinstance(toks, list) and len(toks) == st.PROMPT_TOKENS
    assert all(isinstance(t, int) for t in toks)
    # stable length: more text must not change the program shape
    st._prev_text += " even more words arrive over time"
    assert len(st._prompt_tokens()) == st.PROMPT_TOKENS


def test_streaming_feed_times_pruned(speech_5s):
    """Consumed feed-time entries are dropped — a live-mic stream feeding
    small packets must not grow _feed_times without bound."""
    pipe = FakePipeline()
    tr = StreamingTranscriber(pipe, StreamingConfig())
    piece = np.concatenate([speech_5s, np.zeros(16000, np.float32)])
    for start in range(0, len(piece), 800):  # 50 ms packets
        tr.feed(piece[start:start + 800])
    assert len(tr._feed_times) > 100
    tr.process_available()  # consumes + emits → prune happens in lookup
    assert tr._consumed > 0
    assert len(tr._feed_times) < 10


def test_draft_model_clears_beam_size_with_warning(nano_model):
    """--draft_model with the CLI's default beam_size=5 must not silently
    decode with beam search while never loading the draft."""
    import warnings as _w

    from whisperx_tpu.asr import TranscriptionPipeline

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        pipe = TranscriptionPipeline(
            model=nano_model,
            asr_options={"draft_model": "self:1", "beam_size": 5},
        )
    assert pipe.asr_options["beam_size"] is None
    assert any("greedy-only" in str(r.message) for r in rec)


def test_streaming_segments_rebased_to_stream_clock():
    """Entry segments (and DTW words) carry stream-absolute times, not
    chunk-relative ones: a caption consumer concatenating entries must
    not see every chunk restart at t=0 (the reference's streaming
    emitter leaves them chunk-relative, mlx_streaming.py:300-312)."""

    class WordPipeline(FakePipeline):
        def transcribe(self, audio, batch_size=8, **kw):
            dur = len(audio) / 16000
            return {
                "segments": [
                    {
                        "start": 0.25,
                        "end": min(0.75, dur),
                        "text": "hi",
                        "words": [
                            {"word": " hi", "start": 0.3, "end": 0.6},
                            {"word": " ?"},  # timing failed: no start/end
                        ],
                    }
                ],
                "language": "en",
            }

    st = StreamingTranscriber(
        WordPipeline(),
        StreamingConfig(min_chunk_seconds=0.5, max_latency_seconds=0.0),
    )
    rng = np.random.default_rng(0)
    chunk = (0.1 * rng.standard_normal(16000)).astype(np.float32)
    st.feed(chunk)
    st.process_available()
    st.feed(chunk)
    st.process_available()
    finals = [r for r in st.stop() if not r["provisional"]]
    assert len(finals) >= 2
    s0, s1 = finals[0]["segments"][0], finals[1]["segments"][0]
    assert s0["start"] == pytest.approx(0.25, abs=1e-3)
    base1 = finals[1]["start"]
    assert base1 > 0
    assert s1["start"] == pytest.approx(base1 + 0.25, abs=1e-3)
    assert s1["end"] <= finals[1]["end"] + 1e-6
    words = s1["words"]
    assert words[0]["start"] == pytest.approx(base1 + 0.3, abs=1e-3)
    assert words[0]["end"] == pytest.approx(base1 + 0.6, abs=1e-3)
    assert "start" not in words[1]  # untimed word passes through intact


def test_concurrent_stop_is_safe():
    """On shutdown, the SIGTERM handler's server.shutdown() races
    serve_forever's finally — both call batcher.stop(). A concurrent
    stop() must not crash on the other caller nulling _worker between
    checks (observed AttributeError in the serve e2e)."""
    b = ContinuousBatcher(FakePipeline(), BatchConfig(max_wait_ms=5))
    b.start()
    errs = []

    def s():
        try:
            b.stop()
        except Exception as e:  # pragma: no cover - the bug under test
            errs.append(e)

    ts = [threading.Thread(target=s) for _ in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs


def test_warmup_streaming_covers_reachable_programs(nano_model):
    """warmup_streaming compiles every program a live stream can reach:
    one per whole-second chunk bucket (1..ceil(max_latency)+1), one
    prompted decode, and one per partial prefix bucket up to the token
    budget. Pin the call count so a warm-path regression (a bucket
    silently dropped) is caught."""
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.serve.streaming import warmup_streaming
    from whisperx_tpu.vad import load_vad_model

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=load_vad_model("energy"),
        asr_options={"temperatures": (0.0,), "sample_len": 8},
        language="en",
        batch_size=2,
    )
    calls = warmup_streaming(
        pipe, max_latency_seconds=2.0, partial_token_budget=64
    )
    # 3 chunk buckets (1..3 s) + 1 prompted + 1 first partial + 1 prefix
    # bucket (32 of budget 64)
    assert calls == 6


def test_speaker_registry_identity_and_update():
    from whisperx_tpu.serve import SpeakerRegistry

    reg = SpeakerRegistry(threshold=0.5)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    a2 = np.array([0.95, 0.05, 0.0])
    assert reg.assign(a, 2.0) == 0
    assert reg.assign(b, 2.0) == 1  # orthogonal → new speaker
    assert reg.assign(a2, 1.0) == 0  # near-duplicate → same speaker
    assert len(reg.centroids) == 2
    # duration-weighted running mean stays unit-norm
    assert abs(np.linalg.norm(reg.centroids[0]) - 1.0) < 1e-9
    # capped registry snaps to nearest instead of growing
    capped = SpeakerRegistry(threshold=0.99, max_speakers=1)
    assert capped.assign(a, 1.0) == 0
    assert capped.assign(b, 1.0) == 0


def test_streaming_online_diarization_consistent_labels():
    """config.diarize=True tags chunk-final segments with speaker labels
    that stay consistent ACROSS chunks: two chunks of the same synthetic
    voice share a label; a spectrally distant voice gets a new one. Uses
    the weightless spectral embedding + energy VAD (hermetic)."""
    sr = 16000
    # 1 s per voice: with max_latency=0 the burst splitter caps chunks at
    # the 1 s warmup bucket, so a 1 s push emits as exactly one chunk-final
    t = np.arange(1 * sr) / sr
    low = (
        0.4 * np.sin(2 * np.pi * 180 * t)
        * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    ).astype(np.float32)
    rng = np.random.default_rng(0)
    high = (
        0.3 * np.sin(2 * np.pi * 2400 * t)
        + 0.05 * rng.standard_normal(len(t))
    ).astype(np.float32)

    st = StreamingTranscriber(
        FakePipeline(),
        StreamingConfig(
            min_chunk_seconds=0.5, max_latency_seconds=0.0, diarize=True
        ),
    )
    for chunk in (low, high, low):
        st.feed(chunk)
        st.process_available()
    finals = [r for r in st.stop() if not r["provisional"]]
    assert len(finals) >= 3
    spk = [f["segments"][0].get("speaker") for f in finals[:3]]
    assert spk[0] is not None and spk[1] is not None
    assert spk[0] == spk[2], f"same voice must keep its label: {spk}"
    assert spk[0] != spk[1], f"distinct voice must get a new label: {spk}"


def test_streaming_chunker_burst_tail_not_below_minimum(speech_5s):
    """The burst splitter must never emit a final remainder shorter than
    min_chunk_seconds (regression: a 30 s + 200-sample push produced a
    ~12 ms micro-chunk that decoded in an unwarmed padding bucket)."""
    cfg = StreamingConfig(min_chunk_seconds=0.5, max_latency_seconds=60.0)
    chunker = StreamingChunker(cfg)
    sr = cfg.sample_rate
    burst = np.concatenate(
        [np.tile(speech_5s, 6), speech_5s[:200]]
    )  # 30 s + 200 samples
    chunks = chunker.push(burst)
    assert chunks, "forced flush must emit"
    min_samples = int(cfg.min_chunk_seconds * sr)
    assert all(len(c) >= min_samples for c in chunks)
    assert all(len(c) <= 30 * sr for c in chunks)
    np.testing.assert_array_equal(np.concatenate(chunks), burst)
