"""Word-level timestamps via wav2vec2 forced alignment (WhisperX style)."""

import sys

import whisperx_tpu


def main(path: str, model: str = "large-v3"):
    audio = whisperx_tpu.load_audio(path)
    pipeline = whisperx_tpu.load_model(model, batch_size=8)
    result = pipeline.transcribe(audio)

    aligner, metadata = whisperx_tpu.load_align_model(result["language"], "tpu")
    aligned = whisperx_tpu.align(
        result["segments"], aligner, metadata, audio, "tpu"
    )
    for word in aligned["word_segments"]:
        start = word.get("start", float("nan"))
        end = word.get("end", float("nan"))
        print(f"{start:7.2f} {end:7.2f}  {word['word']}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or []))
