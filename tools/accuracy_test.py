#!/usr/bin/env python
"""Accuracy regression vs gold transcripts (reference accuracy_test.py:14-58 role).

One-command convert → transcribe → score (turnkey on a connected host):

    python tools/accuracy_test.py AUDIO GOLD_TXT \\
        --convert /path/to/hf_whisper_snapshot --checkpoint /tmp/ckpt

or with an already-converted checkpoint / stock model name:

    python tools/accuracy_test.py AUDIO GOLD_TXT --checkpoint /tmp/ckpt
    python tools/accuracy_test.py AUDIO GOLD_TXT --model large-v3

Computes WER/CER of the pipeline's transcript against the gold text (e.g.
the reference's 30m.txt gold artifact) and word-timestamp deltas against a
gold JSON with word_segments (short.json shape) when provided. The whole
recipe is CI-proven against a synthetic full-rank HF fixture
(tools/make_hf_fixture.py, tests/test_accuracy_path.py), so only the real
weights are missing on hermetic hosts. Targets (reference
validate_performance.py:35-40): WER delta <= 0.3, words within 200 ms.
"""

import argparse
import json
import time

import os
import sys

# Run-from-anywhere: the in-tree package is the subject under test.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("gold_txt")
    ap.add_argument("--gold_json", default=None, help="gold with word_segments")
    ap.add_argument("--model", default="large-v3")
    ap.add_argument(
        "--checkpoint",
        default=None,
        help="converted checkpoint dir (overrides --model)",
    )
    ap.add_argument(
        "--convert",
        default=None,
        help="HF snapshot dir or OpenAI .pt to convert into --checkpoint first",
    )
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument(
        "--chunk_size",
        type=int,
        default=30,
        help="decode window seconds (matches the pipeline's chunk_size)",
    )
    ap.add_argument("--language", default=None)
    ap.add_argument(
        "--vad_method",
        default="silero",
        help="VAD backbone (energy = hermetic, no checkpoint)",
    )
    ap.add_argument("--align", action="store_true")
    ap.add_argument(
        "--platform",
        default=None,
        help="force a JAX platform (e.g. 'cpu'); needed on hosts whose "
        "sitecustomize force-registers a TPU tunnel (env vars don't stick)",
    )
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import whisperx_tpu
    from whisperx_tpu.utils.wer import cer, wer

    if args.convert:
        if not args.checkpoint:
            ap.error("--convert requires --checkpoint OUT_DIR")
        from whisperx_tpu.convert.whisper_hf import (
            convert_hf_whisper,
            convert_openai_whisper,
        )

        if args.convert.endswith(".pt"):
            convert_openai_whisper(args.convert, args.checkpoint)
        else:
            convert_hf_whisper(args.convert, args.checkpoint)
    model_ref = args.checkpoint or args.model

    audio = whisperx_tpu.load_audio(args.audio)
    duration = len(audio) / 16000

    t0 = time.perf_counter()
    pipeline = whisperx_tpu.load_model(
        model_ref,
        batch_size=args.batch,
        language=args.language,
        vad_method=args.vad_method,
    )
    result = pipeline.transcribe(
        audio, batch_size=args.batch, chunk_size=args.chunk_size
    )
    elapsed = time.perf_counter() - t0

    hyp = " ".join(s["text"].strip() for s in result["segments"])
    with open(args.gold_txt, encoding="utf-8") as f:
        gold = f.read()

    report = {
        "model": model_ref,
        "duration_s": round(duration, 1),
        "wall_s": round(elapsed, 1),
        "rtf": round(duration / elapsed, 2),
        "wer": round(wer(gold, hyp), 4),
        "cer": round(cer(gold, hyp), 4),
        "n_segments": len(result["segments"]),
    }

    if args.align and result["segments"]:
        aligner, meta = whisperx_tpu.load_align_model(result["language"], "tpu")
        aligned = whisperx_tpu.align(
            result["segments"], aligner, meta, audio, "tpu"
        )
        report["n_words"] = len(aligned["word_segments"])
        if args.gold_json:
            with open(args.gold_json, encoding="utf-8") as f:
                gold_words = json.load(f).get("word_segments", [])
            deltas = []
            gold_by_word = {}
            for w in gold_words:
                gold_by_word.setdefault(w["word"].strip().lower(), []).append(w)
            for w in aligned["word_segments"]:
                if "start" not in w:
                    continue
                cands = gold_by_word.get(w["word"].strip().lower())
                if cands:
                    best = min(cands, key=lambda g: abs(g["start"] - w["start"]))
                    deltas.append(abs(best["start"] - w["start"]))
            if deltas:
                import numpy as np

                deltas = np.asarray(deltas)
                report["word_dt_mean_s"] = round(float(deltas.mean()), 3)
                report["word_within_50ms"] = round(float((deltas <= 0.05).mean()), 3)
                report["word_within_200ms"] = round(float((deltas <= 0.2).mean()), 3)

    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
