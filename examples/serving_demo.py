"""Continuous-batching serving demo: concurrent requests, priorities."""

import sys

import whisperx_tpu
from whisperx_tpu.serve import BatchConfig, ContinuousBatcher


def main(*paths: str):
    pipeline = whisperx_tpu.load_model("base", batch_size=8)
    batcher = ContinuousBatcher(pipeline, BatchConfig(max_batch_size=8))
    batcher.start()

    requests = [
        batcher.submit(whisperx_tpu.load_audio(p), priority=i, request_id=p)
        for i, p in enumerate(paths)
    ]
    for req in requests:
        req.done.wait()
        text = " ".join(s["text"] for s in req.result["segments"])
        print(f"{req.request_id}: {text[:120]}")
    batcher.stop()
    print("throughput:", round(batcher.throughput_rtf, 1), "x realtime")


if __name__ == "__main__":
    main(*sys.argv[1:])
