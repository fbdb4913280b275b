"""Streaming transcription demo: feed audio incrementally, print partials."""

import sys

import numpy as np

import whisperx_tpu
from whisperx_tpu.serve import StreamingConfig, StreamingTranscriber


def main(path: str, model: str = "base"):
    audio = whisperx_tpu.load_audio(path)
    pipeline = whisperx_tpu.load_model(model, vad_method="energy", batch_size=1)

    st = StreamingTranscriber(
        pipeline,
        StreamingConfig(min_chunk_seconds=1.0, max_latency_seconds=3.0),
        on_result=lambda r: print(
            f"[{r['start']:6.2f}-{r['end']:6.2f}] {r['text']}"
        ),
    )
    # simulate a live feed in 0.5 s packets
    for off in range(0, len(audio), 8000):
        st.feed(audio[off : off + 8000])
        st.process_available()
    st.stop()


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or []))
