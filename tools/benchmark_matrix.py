#!/usr/bin/env python
"""Benchmark matrix: {model} × {batch size} RTF table.

Role of reference benchmark_whisperx.py:19-26 (its CLI matrix over
{small,base,large-v3} × {batch 1,16}), measured in-process instead of via
os.system.
"""

import argparse
import json
import time

import numpy as np

import os
import sys

# Run-from-anywhere: the in-tree package is the subject under test.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def synth(duration_s, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(duration_s * sr)) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    sig = sum((0.5 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr) for k in range(1, 6))
    gaps = (np.sin(2 * np.pi * 0.13 * t) > -0.85).astype(np.float64)
    return (0.3 * sig * gaps / np.abs(sig * gaps + 1e-9).max()).astype(np.float32)


def main():
    import os

    import jax

    try:
        cache_dir = os.path.expanduser("~/.cache/whisperx_tpu/xla_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="*", default=["tiny", "base", "small", "large-v3"])
    ap.add_argument("--batches", nargs="*", type=int, default=[1, 8, 16])
    ap.add_argument("--seconds", type=float, default=300)
    ap.add_argument("--sample_len", type=int, default=128)
    ap.add_argument("--compute_type", default="bfloat16")
    ap.add_argument(
        "--repeats", type=int, default=3,
        help="best-of-N timed passes per cell (chip contention swings "
             "single readings; see bench.py's adaptive methodology)",
    )
    args = ap.parse_args()

    from whisperx_tpu.asr import load_model

    audio = synth(args.seconds)
    rows = []
    for model_name in args.models:
        for batch in args.batches:
            pipeline = load_model(
                model_name,
                vad_method="energy",
                language="en",
                compute_type=args.compute_type,
                asr_options={
                    "temperatures": (0.0,),
                    "without_timestamps": True,
                    "log_prob_threshold": None,
                    "compression_ratio_threshold": None,
                    "no_speech_threshold": None,
                    "sample_len": args.sample_len,
                },
                batch_size=batch,
            )
            pipeline.transcribe(audio[: 16000 * 60], batch_size=batch)  # warmup
            dt = float("inf")
            for _ in range(max(1, args.repeats)):
                t0 = time.perf_counter()
                pipeline.transcribe(audio, batch_size=batch)
                dt = min(dt, time.perf_counter() - t0)
            row = {
                "model": model_name,
                "batch": batch,
                "compute_type": args.compute_type,
                "rtf": round(args.seconds / dt, 2),
                "wall_s": round(dt, 2),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"matrix": rows}))


if __name__ == "__main__":
    main()
