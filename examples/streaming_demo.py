"""Streaming transcription demo: feed audio incrementally, print partials.

With ``partial_interval_seconds`` set, PROVISIONAL transcripts of the
still-growing utterance are emitted before any silence flush: committed
tokens (LocalAgreement-2 between consecutive partials) replay as the
decode prefix, so each re-decode generates only the unstable tail. Every
result carries ``latency_s`` (newest-sample-fed → result emitted);
``st.latency_stats()`` summarizes.
"""

import sys

import numpy as np

import whisperx_tpu
from whisperx_tpu.serve import StreamingConfig, StreamingTranscriber


def main(path: str, model: str = "base"):
    audio = whisperx_tpu.load_audio(path)
    pipeline = whisperx_tpu.load_model(model, vad_method="energy", batch_size=1)

    def show(r):
        tag = "partial" if r.get("provisional") else "final  "
        lat = f" ({r['latency_s'] * 1000:.0f} ms)" if "latency_s" in r else ""
        print(f"{tag} [{r['start']:6.2f}-{r['end']:6.2f}]{lat} {r['text']}")

    st = StreamingTranscriber(
        pipeline,
        StreamingConfig(
            min_chunk_seconds=1.0,
            max_latency_seconds=3.0,
            partial_interval_seconds=1.0,
        ),
        on_result=show,
    )
    # simulate a live feed in 0.5 s packets
    for off in range(0, len(audio), 8000):
        st.feed(audio[off : off + 8000])
        st.process_available()
    st.stop()
    print("latency:", st.latency_stats())


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or []))
