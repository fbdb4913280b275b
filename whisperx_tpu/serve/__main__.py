"""Serve a Whisper transcription HTTP endpoint.

Usage:
    python -m whisperx_tpu.serve --model large-v3 --port 9090
    curl -s -X POST --data-binary @clip.wav \
        http://127.0.0.1:9090/v1/audio/transcriptions | jq .
"""

import argparse


def main():
    parser = argparse.ArgumentParser(
        prog="whisperx_tpu.serve",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("--model", default="small", help="Whisper model name or converted checkpoint dir")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=9090)
    parser.add_argument("--device", default="tpu", help="tpu (default) or cpu")
    parser.add_argument("--compute_type", default="bfloat16", choices=["bfloat16", "float16", "float32", "int8", "int4"])
    parser.add_argument("--language", default=None, help="pin the transcription language (default: auto-detect)")
    parser.add_argument("--task", default="transcribe", choices=["transcribe", "translate"])
    parser.add_argument("--vad_method", default="silero", help="silero | pyannote | energy | none")
    parser.add_argument("--batch_size", type=int, default=16, help="device decode batch size")
    parser.add_argument("--max_batch_size", type=int, default=8, help="max requests coalesced per serving batch")
    parser.add_argument("--max_wait_ms", type=float, default=100.0, help="max time to wait for batch stragglers")
    parser.add_argument("--max_queue_depth", type=int, default=1024, help="shed requests with 503 past this many pending (0 = unbounded)")
    parser.add_argument("--max_body_mb", type=int, default=256, help="reject request bodies over this size with 413")
    parser.add_argument("--max_streams", type=int, default=64, help="cap concurrent streaming sessions (429 past this)")
    parser.add_argument("--word_timestamps", action="store_true", help="attach cross-attention DTW word timings to every segment")
    parser.add_argument("--temperature", type=float, default=0.0, help="initial sampling temperature")
    parser.add_argument("--temperature_increment_on_fallback", type=float, default=0.2, help="quality-gate retry temperature step; 0 disables the retry ladder (random-weight benches MUST disable it: gates always fail and every chunk would cascade through all 6 temperatures with best_of tiling)")
    parser.add_argument("--no_warmup", action="store_true", help="skip pre-compiling the decode/mel/VAD programs at startup (first request then pays the XLA compiles)")
    parser.add_argument("--warmup_streaming", action="store_true", help="also pre-compile every streaming program (chunk-length buckets, prompted decode, partial prefix buckets) — a few extra minutes of startup, no mid-stream compile stalls")
    parser.add_argument("--align_model", type=str, default=None, help="wav2vec2 checkpoint/name for per-request ?align=true (default: per-language registry)")
    parser.add_argument("--diarize_model", type=str, default=None, help="diarization checkpoint/name for per-request ?diarize=true")
    parser.add_argument("--draft_model", type=str, default=None, help="enable speculative decoding: draft checkpoint/name or 'self:N'")
    parser.add_argument("--spec_gamma", type=int, default=4, help="speculative draft length per verify step")
    parser.add_argument("--data_parallel", type=str, default="auto", choices=["auto", "on", "off"], help="shard decode batches over all local devices (auto: when >1 device)")
    parser.add_argument("--n_model", type=int, default=1, help="tensor-parallel width within the device mesh (data axis = n_devices / n_model)")
    args = parser.parse_args()

    from whisperx_tpu.__main__ import _pin_platform

    _pin_platform(args.device)

    from whisperx_tpu.asr import load_model
    from whisperx_tpu.serve.batching import BatchConfig
    from whisperx_tpu.serve.server import TranscriptionServer

    pipeline = load_model(
        args.model,
        device=args.device,
        compute_type=args.compute_type,
        language=args.language,
        vad_method=args.vad_method,
        task=args.task,
        batch_size=args.batch_size,
        asr_options={
            **({"word_timestamps": True} if args.word_timestamps else {}),
            **(
                {"draft_model": args.draft_model, "spec_gamma": args.spec_gamma}
                if args.draft_model
                else {}
            ),
            # same ladder as the transcription CLI; step 0 disables retries
            "temperatures": __import__(
                "whisperx_tpu.transcribe", fromlist=["_fallback_temperatures"]
            )._fallback_temperatures(
                args.temperature,
                args.temperature_increment_on_fallback or None,
            ),
        },
    )
    import jax

    n_dev = len(jax.devices())
    if args.data_parallel == "on" or (
        args.data_parallel == "auto" and n_dev > 1
    ):
        from whisperx_tpu.parallel import DataParallelPipeline

        pipeline = DataParallelPipeline(pipeline, n_model=args.n_model)
        print(
            f"data-parallel serving over {n_dev} devices "
            f"(data={n_dev // args.n_model} x model={args.n_model})"
        )

    server = TranscriptionServer(
        pipeline,
        model_name=args.model,
        batch_config=BatchConfig(
            max_batch_size=args.max_batch_size,
            max_wait_ms=args.max_wait_ms,
            max_queue_depth=args.max_queue_depth,
        ),
        max_body_bytes=args.max_body_mb * 1024 * 1024,
        max_streams=args.max_streams,
        align_model=args.align_model,
        diarize_model=args.diarize_model,
    )
    if not args.no_warmup:
        # compile the decode/mel/VAD programs BEFORE binding the port, so
        # the first client request doesn't absorb minutes of XLA compiles
        warm = getattr(pipeline, "warmup", None)
        if warm is not None:
            import time as _time

            t0 = _time.monotonic()
            print("warming XLA programs (first compile is the slow one)…")
            warm()
            if args.warmup_streaming:
                from whisperx_tpu.serve.streaming import warmup_streaming

                n = warmup_streaming(pipeline, language=args.language)
                print(f"streaming warmup: {n} programs")
            print(f"warmup done in {_time.monotonic() - t0:.1f}s")

    import signal
    import threading

    def _term(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)

    print(f"whisperx-tpu serving {args.model} on http://{args.host}:{args.port}")
    try:
        server.serve_forever(args.host, args.port)
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
