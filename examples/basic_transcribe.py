"""Basic transcription (parity: reference examples/mlx/basic usage)."""

import sys

import whisperx_tpu


def main(path: str, model: str = "large-v3"):
    audio = whisperx_tpu.load_audio(path)
    pipeline = whisperx_tpu.load_model(model, vad_method="silero", batch_size=8)
    result = pipeline.transcribe(audio, batch_size=8)
    for seg in result["segments"]:
        print(f"[{seg['start']:7.2f} --> {seg['end']:7.2f}] {seg['text']}")
    print(f"\nlanguage: {result['language']}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or []))
