"""CI smoke for tools/serve_load.py (VERDICT r3 Next #5).

Runs the load tool's sweep functions against an in-process server with a
FakePipeline (no device work): concurrency accounting, latency
percentiles, the WS stream sweep, and the 503 shed curve all execute the
real sockets + real batching layer. The chip-scale run is the documented
command in docs/SERVING.md.
"""

import os
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "examples"))

from whisperx_tpu.serve.batching import BatchConfig
from whisperx_tpu.serve.server import TranscriptionServer


class SlowFakePipeline:
    """Echo pipeline with a fixed service time, so queueing is real."""

    def __init__(self, delay_s=0.15):
        self.language = "en"
        self.task = "transcribe"
        self.delay_s = delay_s

    def transcribe(self, audio, batch_size=8, **kw):
        time.sleep(self.delay_s)
        return {
            "segments": [
                {"start": 0.0, "end": len(audio) / 16000, "text": "ok"}
            ],
            "language": "en",
        }


@pytest.fixture
def server():
    srv = TranscriptionServer(
        SlowFakePipeline(),
        model_name="fake",
        batch_config=BatchConfig(
            max_batch_size=2, max_wait_ms=5, max_queue_depth=3
        ),
    )
    port = srv.start_background(port=0)
    yield srv, port
    srv.shutdown()


def test_http_sweep_and_overload(server):
    import serve_load

    _, port = server
    url = f"http://127.0.0.1:{port}"
    rows = serve_load.http_sweep(url, [1, 2], requests_per_client=2, seconds=2.0)
    assert [r["clients"] for r in rows] == [1, 2]
    for r in rows:
        assert r["ok"] == r["requests"] == r["clients"] * 2
        assert r["p50_s"] > 0 and r["p99_s"] >= r["p50_s"]
        assert r["aggregate_rtf"] > 0

    burst = serve_load.overload_burst(url, burst=12, seconds=2.0)
    # 12 simultaneous uploads against queue depth 3 + 0.15 s service time
    # must shed some — and serve the ones it admits
    assert burst["shed_503"] > 0
    assert burst["ok"] >= 3
    assert burst["other"] == 0
    assert burst["first_503_at_s"] is not None


def test_ws_sweep(server):
    import serve_load

    _, port = server
    rows = serve_load.ws_sweep(
        "127.0.0.1", port, [1, 2], seconds=3.0, partial_interval=None
    )
    assert [r["streams"] for r in rows] == [1, 2]
    # chunk-final latencies recorded for every stream level
    assert all(r["partials"] >= 1 for r in rows)
    assert all("partial_p50_s" in r for r in rows)
