#!/usr/bin/env python
"""Streaming latency benchmark (VERDICT r2 Missing #5).

Simulates a real-time feed: synthetic speech is pushed in 0.25 s pieces at
(faster-than) real time, the StreamingTranscriber drains after every piece,
and each emitted result records the wall latency from its newest sample
being fed to the result callback. Reports first-result latency, partial
latency, and chunk-final latency — the comparable numbers to the
reference's <500 ms streaming modes (reference OPTIMIZATION_SUMMARY.md:35-39).

Run on the chip:
    python tools/streaming_latency.py --model large-v3
Hermetic smoke (CPU, nano):
    python tools/streaming_latency.py --model test-nano --platform cpu --seconds 8
"""

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="large-v3")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--partial_interval", type=float, default=1.0)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--realtime", action="store_true", help="sleep to feed at 1x")
    ap.add_argument("--sample_len", type=int, default=128, help="max tokens per decode (random weights always hit the cap; real speech EOTs early, so this bounds the latency-vs-tokens curve)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    try:
        import jax

        cache_dir = os.path.expanduser("~/.cache/whisperx_tpu/xla_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import sys
    import warnings

    warnings.filterwarnings("ignore")
    # NOT tests/conftest.synth_speech: importing conftest force-switches
    # the JAX platform to CPU (its job for the test suite), which would
    # silently turn this chip benchmark into a host run
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import synth_speech

    from whisperx_tpu.asr import load_model
    from whisperx_tpu.serve.streaming import StreamingConfig, StreamingTranscriber

    # batch_size=1: latency mode — each flushed chunk decodes as a single
    # row instead of padding into a throughput batch
    pipeline = load_model(
        args.model,
        vad_method="energy",
        language="en",
        asr_options={"temperatures": (0.0,), "sample_len": args.sample_len},
        batch_size=1,
    )
    speech = synth_speech(args.seconds)

    # warmup: compile the decode + partial programs out of the measurement —
    # including the prefix-bucket-32 partial shape (committed prefixes
    # bucket to multiples of 32; each distinct bucket is its own compile)
    # chunk-final decodes arrive bucketed to whole seconds (streaming.py
    # _emit); with max_latency 5 s the reachable buckets are 1..6 s —
    # warm each so no full-pipeline compile lands mid-stream. Prompted
    # chunks (prev-text conditioning) use ONE fixed 32-token prompt
    # program (StreamingTranscriber.PROMPT_TOKENS) — warm it too.
    from whisperx_tpu.serve.streaming import (
        IncrementalUtteranceDecoder,
        StreamingTranscriber,
    )

    for sec in range(1, 7):
        pipeline.transcribe(speech[: 16000 * sec])
    # the decode program depends on the prompt LENGTH, not the audio
    # length — one prompted call warms it for every bucket
    prompt32 = list(range(300, 300 + StreamingTranscriber.PROMPT_TOKENS))
    pipeline.transcribe(speech[: 16000 * 6], initial_prompt=prompt32)

    budget = min(224, 2 * args.sample_len)
    warm = IncrementalUtteranceDecoder(
        pipeline.model, language="en", token_budget=budget
    )
    warm.partial(speech[: 16000 * 2])
    # warm EVERY prefix bucket the stream can reach: committed prefixes
    # grow by PREFIX_BUCKET steps as the utterance lengthens, and each
    # distinct bucket is its own jit program — left cold, those compiles
    # land MID-STREAM and pollute the latency tail with ~90 s outliers
    # (observed: p90 75 s on a run that warmed only the first bucket)
    for n_stable in range(warm.PREFIX_BUCKET, budget, warm.PREFIX_BUCKET):
        warm.stable = list(range(200, 200 + n_stable))
        warm._last_full = None
        warm.partial(speech[: 16000 * 2])

    st = StreamingTranscriber(
        pipeline,
        StreamingConfig(
            min_chunk_seconds=0.5,
            max_latency_seconds=5.0,
            partial_interval_seconds=args.partial_interval,
            partial_token_budget=budget,
        ),
    )
    step = 4000  # 0.25 s pieces
    t0 = time.perf_counter()
    for i in range(0, len(speech), step):
        st.feed(speech[i : i + step])
        st.process_available()
        if args.realtime:
            behind = (i + step) / 16000 - (time.perf_counter() - t0)
            if behind > 0:
                time.sleep(behind)
    results = st.stop()
    wall = time.perf_counter() - t0

    stats = st.latency_stats()
    n_partials = sum(1 for r in results if r.get("provisional"))
    print(
        json.dumps(
            {
                "model": args.model,
                "audio_s": args.seconds,
                "wall_s": round(wall, 2),
                "results": len(results),
                "partials": n_partials,
                **stats,
            }
        )
    )


if __name__ == "__main__":
    main()
