"""Word-censoring demo: beep/silence profanity using word timestamps.

Parity: reference censor_audio.py:1-171 (the word-timestamp showcase app).
"""

import argparse

import numpy as np

import whisperx_tpu
from whisperx_tpu.audio.io import save_wav

DEFAULT_WORDS = {"badword", "darn", "heck"}


def censor(
    audio: np.ndarray,
    words: list,
    banned: set,
    mode: str = "beep",
    sr: int = 16000,
) -> np.ndarray:
    out = audio.copy()
    for w in words:
        if w["word"].strip().lower().strip(".,!?") not in banned:
            continue
        if "start" not in w or "end" not in w:
            continue
        s, e = int(w["start"] * sr), int(w["end"] * sr)
        if mode == "beep":
            t = np.arange(e - s) / sr
            out[s:e] = 0.3 * np.sin(2 * np.pi * 1000 * t)
        else:
            out[s:e] = 0.0
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio")
    ap.add_argument("output")
    ap.add_argument("--words", nargs="*", default=sorted(DEFAULT_WORDS))
    ap.add_argument("--mode", choices=["beep", "silence"], default="beep")
    ap.add_argument("--model", default="large-v3")
    args = ap.parse_args()

    audio = whisperx_tpu.load_audio(args.audio)
    pipeline = whisperx_tpu.load_model(args.model)
    result = pipeline.transcribe(audio)
    aligner, meta = whisperx_tpu.load_align_model(result["language"], "tpu")
    aligned = whisperx_tpu.align(result["segments"], aligner, meta, audio, "tpu")

    censored = censor(audio, aligned["word_segments"], set(args.words), args.mode)
    save_wav(args.output, censored)
    n = sum(
        1
        for w in aligned["word_segments"]
        if w["word"].strip().lower().strip(".,!?") in set(args.words)
    )
    print(f"censored {n} words → {args.output}")


if __name__ == "__main__":
    main()
