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


def transcribe_task(args: dict, parser: argparse.ArgumentParser):
    from whisperx_tpu.alignment import align, load_align_model
    from whisperx_tpu.asr import load_model
    from whisperx_tpu.audio import load_audio
    from whisperx_tpu.diarize import DiarizationPipeline, assign_word_speakers

    model_name: str = args.pop("model")
    backend: str = args.pop("backend")
    batch_size: int = args.pop("batch_size")
    model_dir = args.pop("model_dir")
    model_cache_only: bool = args.pop("model_cache_only")
    output_dir: str = args.pop("output_dir")
    output_format: str = args.pop("output_format")
    device: str = args.pop("device")
    device_index: int = args.pop("device_index")
    compute_type: str = args.pop("compute_type")
    verbose: bool = args.pop("verbose")
    word_timestamps: bool = args.pop("word_timestamps")
    log_json: str = args.pop("log_json", None)

    os.makedirs(output_dir, exist_ok=True)

    align_model_name = args.pop("align_model")
    interpolate_method: str = args.pop("interpolate_method")
    no_align: bool = args.pop("no_align")
    task: str = args.pop("task")
    if task == "translate":
        no_align = True  # translation cannot be aligned
    return_char_alignments: bool = args.pop("return_char_alignments")

    hf_token = args.pop("hf_token")
    vad_method: str = args.pop("vad_method")
    vad_onset: float = args.pop("vad_onset")
    vad_offset: float = args.pop("vad_offset")
    chunk_size: int = args.pop("chunk_size")

    diarize: bool = args.pop("diarize")
    min_speakers = args.pop("min_speakers")
    max_speakers = args.pop("max_speakers")
    diarize_model_name: str = args.pop("diarize_model")
    diarize_clustering: str = args.pop("diarize_clustering", None)
    print_progress: bool = args.pop("print_progress")
    return_speaker_embeddings: bool = args.pop("speaker_embeddings")
    args.pop("fp16", None)
    args.pop("segment_resolution", None)
    args.pop("threads", None)

    if return_speaker_embeddings and not diarize:
        warnings.warn("--speaker_embeddings has no effect without --diarize")

    if args["language"] is not None:
        args["language"] = args["language"].lower()
        if args["language"] not in LANGUAGES:
            if args["language"] in TO_LANGUAGE_CODE:
                args["language"] = TO_LANGUAGE_CODE[args["language"]]
            else:
                raise ValueError(f"Unsupported language: {args['language']}")

    if model_name.endswith(".en") and args["language"] != "en":
        if args["language"] is not None:
            warnings.warn(
                f"{model_name} is an English-only model but received "
                f"'{args['language']}'; using English instead."
            )
        args["language"] = "en"
    align_language = args["language"] if args["language"] is not None else "en"

    temperature = args.pop("temperature")
    increment = args.pop("temperature_increment_on_fallback")
    if increment is not None:
        temperature = tuple(np.arange(temperature, 1.0 + 1e-6, increment))
    else:
        temperature = (temperature,)

    asr_options = {
        "beam_size": args.pop("beam_size"),
        "best_of": args.pop("best_of"),
        "patience": args.pop("patience"),
        "length_penalty": args.pop("length_penalty"),
        "temperatures": temperature,
        "compression_ratio_threshold": args.pop("compression_ratio_threshold"),
        "log_prob_threshold": args.pop("logprob_threshold"),
        "no_speech_threshold": args.pop("no_speech_threshold"),
        "condition_on_previous_text": args.pop("condition_on_previous_text"),
        "initial_prompt": args.pop("initial_prompt"),
        "suppress_tokens": [int(x) for x in args.pop("suppress_tokens").split(",")],
        "suppress_numerals": args.pop("suppress_numerals"),
        "word_timestamps": word_timestamps,
        "hallucination_silence_threshold": args.pop(
            "hallucination_silence_threshold"
        ),
        "draft_model": args.pop("draft_model"),
        "spec_gamma": args.pop("spec_gamma"),
    }

    writer = get_writer(output_format, output_dir)
    word_options = ["highlight_words", "max_line_count", "max_line_width"]
    if no_align:
        for option in word_options:
            if args[option]:
                parser.error(f"--{option} not possible with --no_align")
    if args["max_line_count"] and not args["max_line_width"]:
        warnings.warn("--max_line_count has no effect without --max_line_width")
    writer_args = {arg: args.pop(arg) for arg in word_options}

    # Part 1: VAD & ASR over every input file.
    model = load_model(
        model_name if model_dir is None else os.path.join(model_dir, model_name),
        device=device,
        device_index=device_index,
        compute_type=compute_type,
        language=args["language"],
        asr_options=asr_options,
        vad_method=vad_method,
        vad_options={
            "chunk_size": chunk_size,
            "vad_onset": vad_onset,
            "vad_offset": vad_offset,
        },
        task=task,
        local_files_only=model_cache_only,
        backend=backend,
        batch_size=batch_size,
    )

    data_parallel: str = args.pop("data_parallel", "auto")
    if data_parallel != "off":
        import jax

        n_dev = len(jax.devices())
        if data_parallel == "on" or n_dev > 1:
            from whisperx_tpu.parallel import DataParallelPipeline

            model = DataParallelPipeline(model)
            if verbose:
                print(f">>Data-parallel decode over {n_dev} devices")

    audio_paths = args.pop("audio")
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

    results = []
    # audio is NOT cached across phases: waveforms are ~230 MB/hour and a
    # batch of files would hold every one in RAM simultaneously — align/
    # diarize reload per file instead (both accept a path), matching the
    # reference's per-phase reload
    for audio_path in audio_paths:
        audio = load_audio(audio_path)
        print(">>Performing transcription...")
        result = model.transcribe(
            audio,
            batch_size=batch_size,
            chunk_size=chunk_size,
            print_progress=print_progress,
            verbose=verbose,
        )
        results.append((result, audio_path))

    # Part 2: forced alignment (same process, same device).
    if not no_align:
        tmp_results, results = results, []
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
        for result, audio_path in tmp_results:
            if align_model is not None and len(result["segments"]) > 0:
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
                result = align(
                    result["segments"],
                    align_model,
                    align_metadata,
                    audio_path,
                    device,
                    interpolate_method=interpolate_method,
                    return_char_alignments=return_char_alignments,
                    print_progress=print_progress,
                )
            results.append((result, audio_path))

    # Part 3: diarization + speaker assignment.
    if diarize:
        tmp_results, results = results, []
        print(">>Performing diarization...")
        print(">>Using model:", diarize_model_name)
        diarize_model = DiarizationPipeline(
            model_name=diarize_model_name, use_auth_token=hf_token,
            device=device, clustering=diarize_clustering,
        )
        for result, audio_path in tmp_results:
            diarize_result = diarize_model(
                audio_path,
                min_speakers=min_speakers,
                max_speakers=max_speakers,
                return_embeddings=return_speaker_embeddings,
            )
            if return_speaker_embeddings:
                diarize_segments, speaker_embeddings = diarize_result
            else:
                diarize_segments, speaker_embeddings = diarize_result, None
            result = assign_word_speakers(diarize_segments, result, speaker_embeddings)
            results.append((result, audio_path))

    # Part 4: write outputs.
    for result, audio_path in results:
        result = dict(result)
        result.setdefault("language", align_language)
        writer(result, audio_path, writer_args)

    if log_json:
        from whisperx_tpu.utils.metrics import GLOBAL_TRACKER

        GLOBAL_TRACKER.emit_jsonl(log_json, extra={"files": len(results)})
        print(f">>Metrics written to {log_json}")
