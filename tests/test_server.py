"""HTTP serving layer tests (stdlib client vs in-process server).

The server wraps ContinuousBatcher (batch endpoint) and per-session
StreamingTranscribers (stream endpoints); these tests drive it over real
sockets with a FakePipeline so they stay fast.
"""

import io
import json
import sys
import urllib.error
import urllib.request
import wave
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
from conftest import synth_speech

from whisperx_tpu.serve.batching import BatchConfig
from whisperx_tpu.serve.server import TranscriptionServer, _decode_body


class FakePipeline:
    def __init__(self):
        self.calls = []
        self.language = "en"
        self.task = "transcribe"

    def transcribe(self, audio, batch_size=8, **kw):
        self.calls.append((len(audio), kw))
        return {
            "segments": [
                {"start": 0.0, "end": len(audio) / 16000, "text": "ok"}
            ],
            "language": kw.get("language") or "en",
        }


def _wav_bytes(audio: np.ndarray, sr: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((audio * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def _post(url, body, headers=None, method="POST"):
    req = urllib.request.Request(url, data=body, method=method)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=30) as resp:
        return resp.status, json.loads(resp.read())


@pytest.fixture
def server():
    srv = TranscriptionServer(
        FakePipeline(), model_name="fake", batch_config=BatchConfig(max_wait_ms=5)
    )
    port = srv.start_background(port=0)
    yield srv, f"http://127.0.0.1:{port}"
    srv.shutdown()


def test_healthz(server):
    srv, base = server
    with urllib.request.urlopen(base + "/healthz", timeout=10) as resp:
        payload = json.loads(resp.read())
    assert payload["status"] == "ok"
    assert payload["model"] == "fake"
    assert "queue_depth" in payload and "stats" in payload


def test_metrics_endpoint(server):
    srv, base = server
    # generate one request so batcher counters move
    _post(base + "/v1/audio/transcriptions", _wav_bytes(synth_speech(1.0)),
          {"Content-Type": "audio/wav"})
    with urllib.request.urlopen(base + "/metrics", timeout=10) as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert "whisperx_queue_depth" in text
    assert "whisperx_requests 1" in text
    assert "whisperx_throughput_rtf" in text


def test_transcription_wav_roundtrip(server):
    srv, base = server
    audio = synth_speech(2.0)
    status, payload = _post(
        base + "/v1/audio/transcriptions", _wav_bytes(audio),
        {"Content-Type": "audio/wav"},
    )
    assert status == 200
    assert payload["language"] == "en"
    assert payload["segments"][0]["text"] == "ok"
    assert abs(payload["segments"][0]["end"] - 2.0) < 0.05
    assert "request_id" in payload and "wall_s" in payload


def test_transcription_raw_pcm_f32_and_i16(server):
    srv, base = server
    audio = synth_speech(1.0)
    for fmt, body in (
        ("f32", audio.astype(np.float32).tobytes()),
        ("i16", (audio * 32767).astype(np.int16).tobytes()),
    ):
        status, payload = _post(
            base + "/v1/audio/transcriptions", body,
            {"Content-Type": "audio/x-raw-pcm", "X-Format": fmt,
             "X-Sample-Rate": "16000"},
        )
        assert status == 200
        assert abs(payload["segments"][0]["end"] - 1.0) < 0.05


def test_per_request_language_and_task_params(server):
    """?language= and ?task= query params ride through the batcher to the
    pipeline per request."""
    srv, base = server
    status, payload = _post(
        base + "/v1/audio/transcriptions?language=fr&task=translate",
        _wav_bytes(synth_speech(1.0)), {"Content-Type": "audio/wav"},
    )
    assert status == 200
    assert payload["language"] == "fr"
    pipe = srv.pipeline
    assert pipe.calls[-1][1].get("language") == "fr"
    assert pipe.calls[-1][1].get("task") == "translate"


def test_resampled_wav_body(server):
    """8 kHz WAV body → resampled to 16 kHz before transcription."""
    srv, base = server
    audio = synth_speech(2.0)[::2]  # crude 8 kHz signal
    status, payload = _post(
        base + "/v1/audio/transcriptions", _wav_bytes(audio, sr=8000),
        {"Content-Type": "audio/wav"},
    )
    assert status == 200
    # duration preserved through resampling
    assert abs(payload["segments"][0]["end"] - 2.0) < 0.1


def test_error_routes(server):
    srv, base = server
    # unknown route → 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/v1/nope", b"x")
    assert e.value.code == 404
    # empty body → 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/v1/audio/transcriptions", b"",
              {"Content-Type": "audio/x-raw-pcm"})
    assert e.value.code == 400
    # garbage container → 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/v1/audio/transcriptions", b"\x00" * 64,
              {"Content-Type": "application/octet-stream"})
    assert e.value.code == 400
    # unknown stream id → 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/v1/stream/deadbeef0000/audio", b"\x00" * 2048,
              {"Content-Type": "audio/x-raw-pcm"})
    assert e.value.code == 404


def test_bad_params_return_400_and_worker_survives(server):
    """Unvalidated client input must never kill the batcher worker: bad
    language/task/priority/partial_interval → 400, and the endpoint still
    serves afterwards (regression: ?language=klingon used to crash the
    worker thread and hang every later request)."""
    srv, base = server
    wav = _wav_bytes(synth_speech(1.0))
    for qs in ("?language=klingon", "?task=summarize", "?priority=high"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/v1/audio/transcriptions" + qs, wav,
                  {"Content-Type": "audio/wav"})
        assert e.value.code == 400, qs
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/v1/stream/start?partial_interval=abc", b"")
    assert e.value.code == 400
    # odd-length raw PCM is a client error, not a 500
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/v1/audio/transcriptions", b"\x00" * 7,
              {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"})
    assert e.value.code == 400
    # endpoint still alive and serving
    status, payload = _post(base + "/v1/audio/transcriptions", wav,
                            {"Content-Type": "audio/wav"})
    assert status == 200 and payload["segments"]


def test_pipeline_exception_fails_batch_not_worker():
    """A pipeline error fails that request with a 500-surfaced error but
    the worker thread keeps draining subsequent requests."""
    class FlakyPipeline(FakePipeline):
        def transcribe(self, audio, batch_size=8, **kw):
            if len(audio) == 160:  # poison marker
                raise RuntimeError("decode exploded")
            return super().transcribe(audio, batch_size=batch_size, **kw)

    srv = TranscriptionServer(FlakyPipeline(), model_name="flaky",
                              batch_config=BatchConfig(max_wait_ms=5))
    port = srv.start_background(port=0)
    base = f"http://127.0.0.1:{port}"
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/v1/audio/transcriptions",
                  np.zeros(160, np.float32).tobytes(),
                  {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"})
        assert e.value.code == 500
        assert "decode exploded" in json.loads(e.value.read())["error"]
        status, payload = _post(
            base + "/v1/audio/transcriptions", _wav_bytes(synth_speech(1.0)),
            {"Content-Type": "audio/wav"})
        assert status == 200 and payload["segments"]
        with urllib.request.urlopen(base + "/healthz", timeout=10) as resp:
            assert json.loads(resp.read())["stats"].get("errors") == 1
    finally:
        srv.shutdown()


def test_stream_ttl_reaps_abandoned_sessions():
    srv = TranscriptionServer(FakePipeline(), stream_ttl_s=0.2)
    port = srv.start_background(port=0)
    base = f"http://127.0.0.1:{port}"
    try:
        _, p1 = _post(base + "/v1/stream/start", b"")
        import time as _t

        _t.sleep(0.4)
        _, p2 = _post(base + "/v1/stream/start", b"")  # triggers the reap
        assert p1["stream_id"] != p2["stream_id"]
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + f"/v1/stream/{p1['stream_id']}/end", b"")
        assert e.value.code == 404  # reaped
        status, _ = _post(base + f"/v1/stream/{p2['stream_id']}/end", b"")
        assert status == 200  # fresh one unaffected
    finally:
        srv.shutdown()


def _multipart(fields: dict) -> tuple:
    """Build a multipart/form-data body: name -> bytes (file part) or str."""
    boundary = "testboundary123"
    out = b""
    for name, val in fields.items():
        out += f"--{boundary}\r\n".encode()
        if isinstance(val, bytes):
            out += (
                f'Content-Disposition: form-data; name="{name}"; '
                f'filename="clip.wav"\r\n'
                "Content-Type: application/octet-stream\r\n\r\n"
            ).encode() + val + b"\r\n"
        else:
            out += (
                f'Content-Disposition: form-data; name="{name}"\r\n\r\n'
                f"{val}\r\n"
            ).encode()
    out += f"--{boundary}--\r\n".encode()
    return out, f"multipart/form-data; boundary={boundary}"


def test_multipart_upload_openai_shape(server):
    """An OpenAI-SDK-shaped multipart POST (file + model + response_format
    form fields) transcribes and renders per response_format."""
    srv, base = server
    wav = _wav_bytes(synth_speech(2.0))
    body, ctype = _multipart(
        {"file": wav, "model": "whisper-1", "response_format": "text"}
    )
    req = urllib.request.Request(
        base + "/v1/audio/transcriptions", data=body,
        headers={"Content-Type": ctype},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"].startswith("text/plain")
        assert resp.read().decode().strip() == "ok"
    # missing file field is a clean 400
    body2, ctype2 = _multipart({"model": "whisper-1"})
    req2 = urllib.request.Request(
        base + "/v1/audio/transcriptions", data=body2,
        headers={"Content-Type": ctype2},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req2, timeout=10)
    assert e.value.code == 400
    assert "file" in json.loads(e.value.read())["error"]


@pytest.mark.parametrize("fmt,check", [
    ("text", lambda b, h: b.decode().strip() == "ok"),
    ("srt", lambda b, h: b.decode().startswith("1\n00:00:00,000 --> ")),
    ("vtt", lambda b, h: b.decode().startswith("WEBVTT")),
    ("tsv", lambda b, h: b.decode().splitlines()[0] == "start\tend\ttext"),
    ("verbose_json", lambda b, h: (
        json.loads(b)["text"] == "ok" and "duration" in json.loads(b)
        and h["Content-Type"].startswith("application/json"))),
    # no ?diarize -> no speaker labels -> valid empty RTTM (route + writer
    # wiring is what's under test; labelled RTTM is pinned in test_writers)
    ("rttm", lambda b, h: b.decode() == ""),
])
def test_response_format_rendering(server, fmt, check):
    srv, base = server
    req = urllib.request.Request(
        base + f"/v1/audio/transcriptions?response_format={fmt}",
        data=np.zeros(16000, np.float32).tobytes(),
        headers={"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
        assert check(resp.read(), resp.headers)


def test_prompt_param_reaches_pipeline(server):
    """?prompt= (or the multipart 'prompt' field) rides the request into
    the pipeline as initial_prompt."""
    srv, base = server
    req = urllib.request.Request(
        base + "/v1/audio/transcriptions?prompt=glossary:%20XLA",
        data=np.zeros(1600, np.float32).tobytes(),
        headers={"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"},
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        assert resp.status == 200
    assert any(
        kw.get("initial_prompt") == "glossary: XLA"
        for _, kw in srv.pipeline.calls
    )


def test_unknown_response_format_400(server):
    srv, base = server
    req = urllib.request.Request(
        base + "/v1/audio/transcriptions?response_format=yaml",
        data=np.zeros(1600, np.float32).tobytes(),
        headers={"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400
    assert "response_format" in json.loads(e.value.read())["error"]


def test_oversized_body_rejected_with_413():
    """Bodies over max_body_bytes are refused BEFORE being read (reading
    them would be the memory DoS the cap prevents) and the connection
    closes, since the unread body would desync keep-alive."""
    srv = TranscriptionServer(
        FakePipeline(), batch_config=BatchConfig(max_wait_ms=5),
        max_body_bytes=1000,
    )
    port = srv.start_background(port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/audio/transcriptions",
            data=b"\x00" * 2000,
            headers={"Content-Type": "audio/x-raw-pcm", "X-Format": "i16"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 413
        assert e.value.headers.get("Connection", "").lower() == "close"
        # under the cap still works
        ok = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/audio/transcriptions",
            data=np.zeros(400, np.int16).tobytes(),
            headers={"Content-Type": "audio/x-raw-pcm", "X-Format": "i16"},
        )
        with urllib.request.urlopen(ok, timeout=30) as resp:
            assert resp.status == 200
    finally:
        srv.shutdown()


def test_max_streams_cap_returns_429():
    srv = TranscriptionServer(FakePipeline(), max_streams=2)
    port = srv.start_background(port=0)
    base = f"http://127.0.0.1:{port}"
    try:
        _post(base + "/v1/stream/start", b"")
        _post(base + "/v1/stream/start", b"")
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base + "/v1/stream/start", b"")
        assert e.value.code == 429
        assert "max_streams" in json.loads(e.value.read())["error"]
    finally:
        srv.shutdown()


def test_queue_backpressure_returns_503():
    """With the worker stuck decoding and the queue at max_queue_depth,
    new requests shed with 503 + Retry-After instead of queueing
    unboundedly."""
    import threading
    import time as _t

    entered = threading.Event()
    release = threading.Event()

    class BlockingPipeline(FakePipeline):
        def transcribe(self, audio, batch_size=8, **kw):
            entered.set()
            release.wait(10)
            return super().transcribe(audio, batch_size=batch_size, **kw)

    srv = TranscriptionServer(
        BlockingPipeline(),
        batch_config=BatchConfig(max_wait_ms=5, max_queue_depth=1),
    )
    port = srv.start_background(port=0)
    base = f"http://127.0.0.1:{port}/v1/audio/transcriptions"
    pcm = {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"}
    body = np.zeros(1600, np.float32).tobytes()
    t = threading.Thread(target=lambda: _post(base, body, pcm))
    try:
        t.start()
        assert entered.wait(10)  # worker is busy inside the decode
        srv.batcher.submit(np.zeros(1600, np.float32))  # fills depth 1
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(base, body, pcm)
        assert e.value.code == 503
        assert e.value.headers.get("Retry-After") == "1"
    finally:
        release.set()
        t.join(timeout=15)
        srv.shutdown()


def test_chunked_body_rejected_with_411():
    """A Transfer-Encoding: chunked POST gets a clean 411 and the server
    closes the connection — unread chunked frames must never be parsed
    as the next request line on the keep-alive socket."""
    import http.client

    srv = TranscriptionServer(
        FakePipeline(), batch_config=BatchConfig(max_wait_ms=5)
    )
    port = srv.start_background(port=0)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.putrequest("POST", "/v1/audio/transcriptions")
        conn.putheader("Transfer-Encoding", "chunked")
        conn.putheader("Content-Type", "audio/x-raw-pcm")
        conn.endheaders()
        try:  # server may reply + close before the frames land
            conn.send(b"4\r\nabcd\r\n0\r\n\r\n")
        except (BrokenPipeError, ConnectionResetError):
            pass
        resp = conn.getresponse()
        assert resp.status == 411
        assert "Content-Length" in json.loads(resp.read())["error"]
        assert resp.headers.get("Connection", "").lower() == "close"
        conn.close()
    finally:
        srv.shutdown()


def test_reap_abandons_without_final_decode():
    """TTL reaping runs on /healthz and POST handler threads, so it must
    be O(1): no final-tail decode of the abandoned stream (the client is
    gone; the output would be discarded) and no blocking worker join."""
    import time as _t

    pipe = FakePipeline()
    srv = TranscriptionServer(pipe, stream_ttl_s=0.1)
    sid = srv.open_stream()
    sess = srv.stream(sid)
    # leave a pending tail that stop() WOULD decode
    sess.transcriber.feed(synth_speech(2.0).astype(np.float32))
    calls_before = len(pipe.calls)
    _t.sleep(0.25)
    t0 = _t.monotonic()
    srv._reap_streams()
    assert _t.monotonic() - t0 < 0.5
    assert len(pipe.calls) == calls_before, "reap ran the discarded decode"
    assert sid not in srv.streams
    srv.shutdown()


def test_stream_language_override(server):
    """?language= on /v1/stream/start pins the language of every chunk
    decode in that session."""
    srv, base = server
    _, payload = _post(base + "/v1/stream/start?language=fr", b"")
    sid = payload["stream_id"]
    body = np.concatenate(
        [synth_speech(2.0), np.zeros(16000, np.float32)]
    ).tobytes()
    _post(base + f"/v1/stream/{sid}/audio", body,
          {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"})
    _post(base + f"/v1/stream/{sid}/end", b"")
    pipe = srv.pipeline
    stream_calls = [kw for _, kw in pipe.calls if "language" in kw]
    assert stream_calls and all(
        kw["language"] == "fr" for kw in stream_calls
    )


def test_stream_session_lifecycle(server):
    srv, base = server
    status, payload = _post(base + "/v1/stream/start", b"")
    assert status == 200
    sid = payload["stream_id"]

    # speech then a long silence tail → the chunker flushes mid-stream
    speech = synth_speech(2.0)
    silence = np.zeros(16000, np.float32)
    got_midstream = []
    for piece in (speech[:16000], speech[16000:], silence):
        status, payload = _post(
            base + f"/v1/stream/{sid}/audio",
            piece.astype(np.float32).tobytes(),
            {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"},
        )
        assert status == 200
        got_midstream.extend(payload["results"])

    status, payload = _post(base + f"/v1/stream/{sid}/end", b"")
    assert status == 200
    texts = [r["text"] for r in payload["all_results"]]
    assert texts and all(t == "ok" for t in texts)
    # partial results arrived BEFORE stream end (the serving contract)
    assert got_midstream, "no mid-stream results returned"
    # the session is gone afterwards
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + f"/v1/stream/{sid}/end", b"")
    assert e.value.code == 404


def test_streaming_prev_text_conditioning():
    """Committed text must reach the next chunk's decode as initial_prompt
    (regression: the conditional was inverted and the kwarg dropped)."""
    from whisperx_tpu.serve.streaming import (
        StreamingConfig,
        StreamingTranscriber,
    )

    pipe = FakePipeline()
    tr = StreamingTranscriber(
        pipe, StreamingConfig(condition_on_previous_text=True)
    )
    speech = synth_speech(2.0)
    tr.feed(np.concatenate([speech, np.zeros(16000, np.float32)]))
    tr.process_available()
    tr.feed(np.concatenate([speech, np.zeros(16000, np.float32)]))
    tr.process_available()
    tr.stop()
    assert len(pipe.calls) >= 2
    # first chunk: no prompt; later chunks: committed text as prompt
    assert "initial_prompt" not in pipe.calls[0][1]
    assert pipe.calls[1][1].get("initial_prompt") == "ok"


def test_decode_body_rejects_bad_format():
    with pytest.raises(ValueError):
        _decode_body(b"\x00" * 8, "audio/x-raw-pcm", {"X-Format": "f64"})


def test_pipeline_initial_prompt_override(nano_model, monkeypatch):
    """pipeline.transcribe(initial_prompt=...) must reach DecodingOptions
    (the serving/streaming layers rely on this per-call override)."""
    import whisperx_tpu.asr as asr_mod
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.decoding import get_tokenizer
    from whisperx_tpu.decoding.decode import DecodingResult
    from whisperx_tpu.vad.types import SpeechSegment

    tok = get_tokenizer(True, language="en")
    tb = tok.timestamp_begin
    tokens = [tb, *tok.encode(" hi"), tb + 50]
    seen_prompts = []

    def fake_dispatch(model, mel, opts, **kw):
        seen_prompts.append(opts.prompt)
        return {
            "done": [
                DecodingResult(
                    audio_features=None, language="en", tokens=list(tokens),
                    text="hi", avg_logprob=-0.1, no_speech_prob=0.0,
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
            return [SpeechSegment(start=0.5, end=min(5.0, dur))]

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
        batch_size=4,
    )
    audio = np.zeros(16000 * 6, np.float32)
    pipe.transcribe(audio)
    assert seen_prompts[-1] is None
    pipe.transcribe(audio, initial_prompt="hello world")
    expected = pipe.model_prompt("hello world")
    assert seen_prompts[-1] == expected


def test_concurrent_clients_all_served_and_coalesced():
    """16 simultaneous POSTs: every client gets its own result back and
    the batcher coalesces requests into far fewer pipeline calls."""
    import threading

    class CoalescingPipeline(FakePipeline):
        def __init__(self):
            super().__init__()
            self.many_calls = []
            self.lock = threading.Lock()

        def transcribe_many(self, audios, batch_size=8, **kw):
            with self.lock:
                self.many_calls.append(len(audios))
            return [
                {
                    "segments": [
                        {"start": 0.0, "end": len(a) / 16000,
                         "text": f"len{len(a)}"}
                    ],
                    "language": "en",
                }
                for a in audios
            ]

    pipe = CoalescingPipeline()
    srv = TranscriptionServer(pipe, batch_config=BatchConfig(
        max_batch_size=8, max_wait_ms=150))
    port = srv.start_background(port=0)
    base = f"http://127.0.0.1:{port}"
    results = {}
    errors = []

    def client(i):
        # distinct lengths → distinct texts prove per-client demux
        n = 16000 + i * 160
        body = np.zeros(n, np.float32).tobytes()
        try:
            _, payload = _post(
                base + "/v1/audio/transcriptions", body,
                {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"})
            results[i] = payload["segments"][0]["text"]
        except Exception as e:  # pragma: no cover
            errors.append((i, e))

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        assert len(results) == 16
        for i, text in results.items():
            assert text == f"len{16000 + i * 160}", (i, text)
        # coalescing actually happened: fewer batches than clients
        assert sum(pipe.many_calls) == 16
        assert len(pipe.many_calls) < 16
    finally:
        srv.shutdown()


def test_align_param_attaches_word_scaffolding(server):
    """?align=true runs stage-3 (wav2vec2 alignment) per request: the
    result gains word_segments and per-segment word lists (conftest sets
    WHISPERX_TPU_ALLOW_RANDOM_ALIGN, so the random-weight aligner runs a
    real forward; a hermetic install without it returns empty words via
    the alignment/__init__.py guard — both are structurally aligned)."""
    srv, base = server
    status, payload = _post(
        base + "/v1/audio/transcriptions?align=true",
        _wav_bytes(synth_speech(2.0)),
        {"Content-Type": "audio/wav"},
    )
    assert status == 200
    assert "word_segments" in payload
    assert isinstance(payload["segments"][0]["words"], list)
    assert "wall_s" in payload


def test_diarize_param_labels_speakers(server):
    """?diarize=true runs stage-4 per request (weightless spectral path
    on a hermetic install) and labels segments with speakers."""
    srv, base = server
    status, payload = _post(
        base + "/v1/audio/transcriptions?diarize=true&max_speakers=2",
        _wav_bytes(synth_speech(3.0)),
        {"Content-Type": "audio/wav"},
    )
    assert status == 200
    assert payload["segments"][0].get("speaker", "").startswith("SPEAKER_")


def test_bad_align_param_is_400(server):
    srv, base = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(
            base + "/v1/audio/transcriptions?align=maybe",
            _wav_bytes(synth_speech(0.5)),
            {"Content-Type": "audio/wav"},
        )
    assert exc.value.code == 400


def test_stream_diarize_param_tracks_speakers(server):
    """/v1/stream/start?diarize=true wires online speaker tracking: the
    chunk-final results carry cross-chunk-consistent speaker labels
    (weightless spectral path)."""
    srv, base = server
    _, p = _post(base + "/v1/stream/start?diarize=true&max_speakers=2", b"")
    sid = p["stream_id"]
    sr = 16000
    t = np.arange(2 * sr) / sr
    low = (
        0.4 * np.sin(2 * np.pi * 180 * t)
        * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))
    ).astype(np.float32)
    _post(
        base + f"/v1/stream/{sid}/audio",
        low.tobytes(),
        {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"},
    )
    status, payload = _post(base + f"/v1/stream/{sid}/end", b"")
    assert status == 200
    finals = [r for r in payload["all_results"] if not r["provisional"]]
    assert finals
    speakers = [
        s.get("speaker") for r in finals for s in r["segments"]
    ]
    assert speakers and all(
        sp is not None and sp.startswith("SPEAKER_") for sp in speakers
    )
