"""whisperx-tpu CLI (flag parity: reference whisperx/__main__.py:17-95).

No thread-limit/process-separation environment hacks are needed — the
reference sets OMP/MKL/NUMEXPR_NUM_THREADS=1 before importing torch because
PyTorch threading segfaults MLX (reference __main__.py:6-9); here every
model runs in one JAX process.
"""

import argparse
import platform

from whisperx_tpu.utils import (
    LANGUAGES,
    TO_LANGUAGE_CODE,
    optional_float,
    optional_int,
    str2bool,
)


def build_parser() -> argparse.ArgumentParser:
    # fmt: off
    parser = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("audio", nargs="+", type=str, help="audio file(s) to transcribe")
    parser.add_argument("--model", default="small", help="name of the Whisper model to use (e.g., tiny, small, medium, large-v3, distil-large-v3) or path to a converted checkpoint dir")
    parser.add_argument("--backend", default="auto", choices=["auto", "batched", "sequential"], help="decode path: 'batched' = VAD-chunk batching (fast), 'sequential' = 30s seek loop with full quality gates")
    parser.add_argument("--model_cache_only", type=str2bool, default=False, help="If True, never download; use cached/converted models from --model_dir only")
    parser.add_argument("--model_dir", type=str, default=None, help="directory holding converted model checkpoints")
    parser.add_argument("--device", default="tpu", help="accelerator to use (tpu; cpu works for testing)")
    parser.add_argument("--data_parallel", default="auto", choices=["auto", "on", "off"], help="shard decode batches over all local devices (auto: when >1 device is visible)")
    parser.add_argument("--device_index", default=0, type=int, help="device index")
    parser.add_argument("--batch_size", default=8, type=int, help="the preferred batch size for inference")
    parser.add_argument("--compute_type", default="bfloat16", type=str, choices=["float16", "bfloat16", "float32", "int8", "int4"], help="compute type for computation")

    parser.add_argument("--word_timestamps", type=str2bool, default=False, help="Extract word-level timestamps via cross-attention DTW (independent of wav2vec2 alignment)")

    parser.add_argument("--output_dir", "-o", type=str, default=".", help="directory to save the outputs")
    parser.add_argument("--output_format", "-f", type=str, default="all", choices=["all", "srt", "vtt", "txt", "tsv", "json", "aud", "rttm"], help="format of the output file; if not specified, all available formats will be produced")
    parser.add_argument("--verbose", type=str2bool, default=True, help="whether to print out the progress and debug messages")

    parser.add_argument("--task", type=str, default="transcribe", choices=["transcribe", "translate"], help="whether to perform X->X speech recognition ('transcribe') or X->English translation ('translate')")
    parser.add_argument("--language", type=str, default=None, choices=sorted(LANGUAGES.keys()) + sorted([k.title() for k in TO_LANGUAGE_CODE.keys()]), help="language spoken in the audio, specify None to perform language detection")

    # alignment params
    parser.add_argument("--align_model", default=None, help="Name of phoneme-level ASR model to do alignment")
    parser.add_argument("--interpolate_method", default="nearest", choices=["nearest", "linear", "ignore"], help="For word .srt, method to assign timestamps to non-aligned words, or merge them into neighbouring.")
    parser.add_argument("--no_align", action="store_true", help="Do not perform phoneme alignment")
    parser.add_argument("--return_char_alignments", action="store_true", help="Return character-level alignments in the output json file")

    # vad params
    parser.add_argument("--vad_method", type=str, default="silero", choices=["pyannote", "silero", "hybrid", "energy", "none"], help="VAD method to be used")
    parser.add_argument("--vad_onset", type=float, default=0.500, help="Onset threshold for VAD; reduce if speech is not being detected")
    parser.add_argument("--vad_offset", type=float, default=0.363, help="Offset threshold for VAD; reduce if speech is not being detected")
    parser.add_argument("--chunk_size", type=int, default=30, help="Chunk size for merging VAD segments")

    # diarization params
    parser.add_argument("--diarize", action="store_true", help="Apply diarization to assign speaker labels to each segment/word")
    parser.add_argument("--min_speakers", default=None, type=int, help="Minimum number of speakers in audio file")
    parser.add_argument("--max_speakers", default=None, type=int, help="Maximum number of speakers in audio file")
    parser.add_argument("--diarize_model", default="pyannote-tpu", type=str, help="Name/path of the speaker diarization model to use")
    parser.add_argument("--speaker_embeddings", action="store_true", help="Include speaker embeddings in JSON output (only works with --diarize)")
    parser.add_argument("--diarize_clustering", default=None, choices=["ahc", "spectral", "plda"], help="Speaker clustering: cosine AHC (default), spectral, or PLDA log-likelihood-ratio scoring (WHISPERX_TPU_PLDA_CKPT or self-trained)")

    parser.add_argument("--temperature", type=float, default=0, help="temperature to use for sampling")
    parser.add_argument("--best_of", type=optional_int, default=5, help="number of candidates when sampling with non-zero temperature")
    parser.add_argument("--beam_size", type=optional_int, default=5, help="number of beams in beam search, only applicable when temperature is zero")
    parser.add_argument("--patience", type=float, default=1.0, help="optional patience value to use in beam decoding")
    parser.add_argument("--length_penalty", type=float, default=1.0, help="optional token length penalty coefficient (alpha)")
    parser.add_argument("--draft_model", type=str, default=None, help="enables speculative decoding: name or checkpoint path of a draft Whisper model (e.g. a distil variant), or 'self:N' to draft from the target's own first N decoder layers (no second checkpoint; speedup depends on early-exit agreement). Greedy batched decode only; output is token-identical to non-speculative greedy decoding")
    parser.add_argument("--spec_gamma", type=int, default=4, help="tokens drafted per speculative verify pass (only with --draft_model)")

    parser.add_argument("--suppress_tokens", type=str, default="-1", help="comma-separated list of token ids to suppress during sampling; '-1' suppresses most special characters except common punctuations")
    parser.add_argument("--suppress_numerals", action="store_true", help="whether to suppress numeric and currency symbols, since wav2vec2 cannot align them correctly")

    parser.add_argument("--initial_prompt", type=str, default=None, help="optional text to provide as a prompt for the first window")
    parser.add_argument("--condition_on_previous_text", type=str2bool, default=False, help="if True, provide the previous output of the model as a prompt for the next window")
    parser.add_argument("--fp16", type=str2bool, default=True, help="kept for CLI compatibility; TPU uses bfloat16")

    parser.add_argument("--temperature_increment_on_fallback", type=optional_float, default=0.2, help="temperature to increase when falling back when the decoding fails to meet either of the thresholds below")
    parser.add_argument("--compression_ratio_threshold", type=optional_float, default=2.4, help="if the gzip compression ratio is higher than this value, treat the decoding as failed")
    parser.add_argument("--logprob_threshold", type=optional_float, default=-1.0, help="if the average log probability is lower than this value, treat the decoding as failed")
    parser.add_argument("--no_speech_threshold", type=optional_float, default=0.6, help="if the probability of the <|nospeech|> token is higher than this value AND the decoding has failed due to `logprob_threshold`, consider the segment as silence")
    parser.add_argument("--hallucination_silence_threshold", type=optional_float, default=None, help="(requires --word_timestamps True) skip silent periods longer than this threshold (in seconds) when a possible hallucination is detected; also evicts low-confidence segments surrounded by silence")

    parser.add_argument("--max_line_width", type=optional_int, default=None, help="(requires alignment) the maximum number of characters in a line before breaking the line")
    parser.add_argument("--max_line_count", type=optional_int, default=None, help="(requires alignment) the maximum number of lines in a segment")
    parser.add_argument("--highlight_words", type=str2bool, default=False, help="(requires alignment) underline each word as it is spoken in srt and vtt")
    parser.add_argument("--segment_resolution", type=str, default="sentence", choices=["sentence", "chunk"], help="(requires alignment) segment granularity for aligned output")

    parser.add_argument("--threads", type=optional_int, default=0, help="number of host threads for audio loading/preprocessing")
    parser.add_argument("--hf_token", type=str, default=None, help="kept for CLI compatibility (gated-model download tokens are handled by the converters)")

    parser.add_argument("--print_progress", type=str2bool, default=False, help="if True, progress will be printed in transcribe() and align() methods")
    parser.add_argument("--log_json", type=str, default=None, help="write structured JSON-lines stage metrics (per-stage RTF, tokens/s, batch fill) to this path")
    parser.add_argument("--version", "-V", action="version", version="whisperx-tpu 0.1.0", help="Show version information and exit")
    parser.add_argument("--python-version", "-P", action="version", version=f"Python {platform.python_version()} ({platform.python_implementation()})", help="Show python version information and exit")
    # fmt: on
    return parser


def _pin_platform(device: str) -> None:
    """Honor --device / JAX_PLATFORMS before any JAX backend initializes.

    The env var alone is not reliable: a TPU host's sitecustomize may
    force-register its platform in every process, so ``--device cpu`` (or
    JAX_PLATFORMS=cpu) must be applied via jax.config before first backend
    touch — this also keeps the CLI usable when the TPU transport is down.
    """
    import os

    # precedence: explicit --device cpu > ambient JAX_PLATFORMS (the host
    # may export its accelerator platform, e.g. a tunneled chip, globally).
    # default device=tpu → honor the env var / JAX's own platform selection.
    want = "cpu" if device == "cpu" else os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        jax.config.update("jax_platforms", want)


def cli():
    parser = build_parser()
    args = parser.parse_args().__dict__
    _pin_platform(args.get("device", "tpu"))

    from whisperx_tpu.transcribe import transcribe_task

    transcribe_task(args, parser)


if __name__ == "__main__":
    cli()
