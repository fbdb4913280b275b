"""CLI orchestrator: 4-phase transcribe → align → diarize → write loop.

Parity: reference whisperx/transcribe.py:17-250, minus the model
load/unload churn — all stages are JAX programs sharing one device, so
there is no cross-runtime memory pressure forcing phase-by-phase unloads
(reference transcribe.py:158-161 deletes the ASR model before aligning).
"""

from __future__ import annotations

import argparse
import os
import warnings

import numpy as np

from whisperx_tpu.utils import LANGUAGES, TO_LANGUAGE_CODE, get_writer

# ASR options assembled straight out of same-named CLI flags; the one
# rename maps flag spelling -> TranscriptionOptions field spelling.
_ASR_FLAG_FIELDS = (
    "beam_size", "best_of", "patience", "length_penalty",
    "compression_ratio_threshold", "no_speech_threshold",
    "condition_on_previous_text", "initial_prompt", "suppress_numerals",
    "hallucination_silence_threshold", "draft_model", "spec_gamma",
)
_ASR_FLAG_RENAMES = {"logprob_threshold": "log_prob_threshold"}
_SUBTITLE_FLAGS = ("highlight_words", "max_line_count", "max_line_width")


def _canonical_language(code, model_name: str):
    """Lowercase + alias-resolve a user language code; apply .en override."""
    if code is not None:
        code = code.lower()
        code = TO_LANGUAGE_CODE.get(code, code)
        if code not in LANGUAGES:
            raise ValueError(f"Unsupported language: {code}")
    if model_name.endswith(".en") and code != "en":
        if code is not None:
            warnings.warn(
                f"dropping --language {code!r}: {model_name} only "
                "understands English"
            )
        code = "en"
    return code


def _fallback_temperatures(t0: float, step) -> tuple:
    """Temperature ladder for quality-gate retries: t0, t0+step, ... <= 1.0."""
    if step is None:
        return (t0,)
    return tuple(np.arange(t0, 1.0 + 1e-6, step))


def transcribe_task(args: dict, parser: argparse.ArgumentParser):
    from whisperx_tpu.alignment import align, load_align_model
    from whisperx_tpu.asr import load_model
    from whisperx_tpu.audio import load_audio
    from whisperx_tpu.diarize import DiarizationPipeline, assign_word_speakers

    take = args.pop  # every consumed flag leaves `args`; the remainder
    # (language + subtitle flags) is validated below

    model_name = take("model")
    backend = take("backend")
    batch_size = take("batch_size")
    model_dir = take("model_dir")
    model_cache_only = take("model_cache_only")
    output_dir = take("output_dir")
    output_format = take("output_format")
    device, device_index = take("device"), take("device_index")
    compute_type = take("compute_type")
    verbose = take("verbose")
    word_timestamps = take("word_timestamps")
    log_json = take("log_json", None)

    os.makedirs(output_dir, exist_ok=True)

    align_model_name = take("align_model")
    interpolate_method = take("interpolate_method")
    no_align = take("no_align")
    task = take("task")
    no_align = no_align or task == "translate"  # translations can't align
    return_char_alignments = take("return_char_alignments")

    hf_token = take("hf_token")
    vad_options = {
        "chunk_size": take("chunk_size"),
        "vad_onset": take("vad_onset"),
        "vad_offset": take("vad_offset"),
    }
    vad_method = take("vad_method")

    diarize = take("diarize")
    min_speakers, max_speakers = take("min_speakers"), take("max_speakers")
    diarize_model_name = take("diarize_model")
    diarize_clustering = take("diarize_clustering", None)
    print_progress = take("print_progress")
    return_speaker_embeddings = take("speaker_embeddings")
    for ignored in ("fp16", "segment_resolution", "threads"):
        take(ignored, None)  # accepted for CLI parity, no-ops on TPU

    if return_speaker_embeddings and not diarize:
        warnings.warn("ignoring --speaker_embeddings: requires --diarize")

    args["language"] = _canonical_language(args["language"], model_name)
    align_language = args["language"] or "en"

    asr_options = {f: take(f) for f in _ASR_FLAG_FIELDS}
    asr_options.update(
        (field, take(flag)) for flag, field in _ASR_FLAG_RENAMES.items()
    )
    asr_options["temperatures"] = _fallback_temperatures(
        take("temperature"), take("temperature_increment_on_fallback")
    )
    asr_options["suppress_tokens"] = [
        int(t) for t in take("suppress_tokens").split(",")
    ]
    asr_options["word_timestamps"] = word_timestamps

    writer = get_writer(output_format, output_dir)
    if no_align:
        for flag in _SUBTITLE_FLAGS:
            if args[flag]:
                parser.error(f"--{flag} requires alignment (drop --no_align)")
    if args["max_line_count"] and not args["max_line_width"]:
        warnings.warn("--max_line_count does nothing unless --max_line_width is set")
    writer_args = {flag: take(flag) for flag in _SUBTITLE_FLAGS}

    # Part 1: VAD & ASR over every input file.
    model_path = (
        model_name if model_dir is None
        else os.path.join(model_dir, model_name)
    )
    model = load_model(
        model_path,
        device=device, device_index=device_index, compute_type=compute_type,
        language=args["language"], task=task, asr_options=asr_options,
        vad_method=vad_method, vad_options=vad_options,
        local_files_only=model_cache_only,
        backend=backend, batch_size=batch_size,
    )
    chunk_size = vad_options["chunk_size"]

    data_parallel: str = take("data_parallel", "auto")
    if data_parallel != "off":
        import jax

        n_dev = len(jax.devices())
        if data_parallel == "on" or n_dev > 1:
            from whisperx_tpu.parallel import DataParallelPipeline

            model = DataParallelPipeline(model)
            if verbose:
                print(f">>Data-parallel decode over {n_dev} devices")

    # duplicates (shell-glob overlap, scripted lists) would transcribe
    # twice and write the same output files twice — process each once
    audio_paths = list(dict.fromkeys(take("audio")))
    try:
        import jax

        multi_host = jax.process_count() > 1
    except Exception:  # only jax/backend unavailability is recoverable
        multi_host = False
    if multi_host:
        # multi-host: whole files shard over DCN (parallel/multihost.py);
        # each host transcribes + writes its own slice with its local mesh
        from whisperx_tpu.parallel import shard_files

        total = len(audio_paths)
        audio_paths = shard_files(audio_paths)
        print(
            f">>Host {jax.process_index()}/{jax.process_count()}: "
            f"{len(audio_paths)} of {total} files"
        )

    # per-file results keyed by input path (dicts preserve insertion
    # order, so outputs are written in the order files were given).
    # audio is NOT cached across phases: waveforms are ~230 MB/hour and a
    # batch of files would hold every one in RAM simultaneously — align/
    # diarize reload per file instead (both accept a path), matching the
    # reference's per-phase reload
    results = {}
    for audio_path in audio_paths:
        print(">>Performing transcription...")
        results[audio_path] = model.transcribe(
            load_audio(audio_path),
            batch_size=batch_size, chunk_size=chunk_size,
            print_progress=print_progress, verbose=verbose,
        )

    # Part 2: forced alignment (same process, same device).
    if not no_align:
        align_model, align_metadata = load_align_model(
            align_language, device, model_name=align_model_name
        )
        if align_metadata.get("random_weights") and not os.environ.get(
            "WHISPERX_TPU_ALLOW_RANDOM_ALIGN"
        ):
            # garbage timings are worse than none: skip instead of emitting
            print(
                ">>Skipping alignment: no converted wav2vec2 checkpoint for "
                f"language {align_language!r} (run whisperx_tpu.convert, or "
                "set WHISPERX_TPU_ALLOW_RANDOM_ALIGN=1 to force)."
            )
            align_model = None
        for audio_path, result in results.items():
            if align_model is None or not result["segments"]:
                continue
            if result.get("language", "en") != align_metadata["language"]:
                print(
                    f"New language found ({result['language']})! Previous was "
                    f"({align_metadata['language']}), loading new alignment model..."
                )
                # reference parity: the reload uses the NEW language's
                # default model (a user --align_model pinned for the
                # first language would be wrong here); align() itself
                # refuses random weights either way
                align_model, align_metadata = load_align_model(
                    result["language"], device
                )
            print(">>Performing alignment...")
            results[audio_path] = align(
                result["segments"], align_model, align_metadata,
                audio_path, device,
                interpolate_method=interpolate_method,
                return_char_alignments=return_char_alignments,
                print_progress=print_progress,
            )

    # Part 3: diarization + speaker assignment.
    if diarize:
        print(">>Performing diarization...")
        print(">>Using model:", diarize_model_name)
        diarize_model = DiarizationPipeline(
            model_name=diarize_model_name, use_auth_token=hf_token,
            device=device, clustering=diarize_clustering,
        )
        for audio_path, result in results.items():
            diarize_out = diarize_model(
                audio_path,
                min_speakers=min_speakers, max_speakers=max_speakers,
                return_embeddings=return_speaker_embeddings,
            )
            turns, spk_emb = (
                diarize_out if return_speaker_embeddings
                else (diarize_out, None)
            )
            results[audio_path] = assign_word_speakers(turns, result, spk_emb)

    # Part 4: write outputs.
    for audio_path, result in results.items():
        result = dict(result)
        result.setdefault("language", align_language)
        writer(result, audio_path, writer_args)

    if log_json:
        from whisperx_tpu.utils.metrics import GLOBAL_TRACKER

        GLOBAL_TRACKER.emit_jsonl(log_json, extra={"files": len(results)})
        print(f">>Metrics written to {log_json}")
