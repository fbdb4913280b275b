"""Full pipeline: VAD + batched ASR + alignment + diarization → SRT."""

import sys

from whisperx_tpu.pipeline import PipelineConfig, UnifiedPipeline
from whisperx_tpu.utils import get_writer


def main(path: str, out_dir: str = "."):
    pipe = UnifiedPipeline(
        PipelineConfig(
            model_name="large-v3",
            batch_size=8,
            align=True,
            diarize=True,
        )
    )
    result = pipe(path, verbose=True)
    writer = get_writer("srt", out_dir)
    writer(result, path, {"max_line_width": 42, "max_line_count": 2, "highlight_words": False})
    print(f"wrote SRT to {out_dir}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:3] or []))
