"""Word-level timestamps from cross-attention alignment heads.

Replaces ``mlx_whisper.timing.add_word_timestamps`` (contract pinned at
reference mlx_ultra_optimized_batch.py:155-162 and
mlx_whisper_optimized_final.py:184-232): teacher-forced forward capturing
cross-attention QK at the alignment heads, temperature-sharpened softmax
over the live frames, per-token z-norm, median filter (width 7), DTW on the
negated matrix, then token→word grouping with punctuation merging and the
duration-anomaly heuristics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import jax.numpy as jnp
import numpy as np

from whisperx_tpu.audio.constants import (
    HOP_LENGTH,
    N_FRAMES,
    SAMPLE_RATE,
    TOKENS_PER_SECOND,
)
from whisperx_tpu.models.whisper.model import (
    KVCache,
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    precompute_cross_kv,
)
from whisperx_tpu.timing.dtw import dtw, median_filter

MEDFILT_WIDTH = 7
QK_SCALE = 1.0


@dataclass
class WordTiming:
    word: str
    tokens: List[int]
    start: float
    end: float
    probability: float


def _teacher_forced_rows(tokenizer, text_token_lists: List[List[int]]):
    """Right-padded [B, L] token matrix of sot_seq + notimestamps + text +
    eot rows, plus per-row true lengths. Right padding is safe under causal
    attention — positions within a row never see the pad tail."""
    prefix = [*tokenizer.sot_sequence, tokenizer.no_timestamps]
    rows = [prefix + list(tt) + [tokenizer.eot] for tt in text_token_lists]
    lengths = [len(r) for r in rows]
    lmax = -(-max(lengths) // 32) * 32  # bucket to 32 (recompile guard)
    toks = np.full((len(rows), lmax), tokenizer.eot, np.int32)
    for i, r in enumerate(rows):
        toks[i, : len(r)] = r
    return jnp.asarray(toks), lengths


def _capture_cross_qk(model, tokens: jnp.ndarray, mels: jnp.ndarray, eot: int):
    """One teacher-forced decoder pass over [B, L] tokens / [B, 3000, M]
    mels, returning (next_token_probs [B,L-1] np, head_qk [A,B,L,1500] np).

    The WHOLE pass is ONE jitted program (cached on the model object, one
    compile per [B, L] bucket) and both outputs are reduced ON DEVICE
    before download. Measured on a tunneled chip, each fix was the
    difference between usable and not:
      - eager ops ran the capture as hundreds of ~30 ms dispatches —
        word_timing was 254 s of a 264 s large-v3 30-min pass; jitting
        collapses it to the actual encoder+decoder compute;
      - alignment-head selection downloads A planes instead of
        layers×heads (large-v3: ~10 of 640);
      - teacher-forced token probabilities: the consumer only reads
        P(next token) under the text-restricted softmax (logits[:, :eot],
        whisper semantics) — the full [B,L,51865] f32 logits were ~106 MB
        (~2.6 s of tunnel) per group for a [B,L] result."""
    import jax

    key = (eot, tuple(model.alignment_heads))
    fn = getattr(model, "_timing_capture_jit", None)
    if fn is None or getattr(model, "_timing_capture_key", None) != key:
        dims = model.dims
        heads = tuple((int(l), int(h)) for l, h in model.alignment_heads)

        @jax.jit
        def _run(params, tokens, mels):
            feats = encoder_forward(
                params, mels.astype(model.dtype), dims.n_audio_head
            )
            ck, cv = precompute_cross_kv(params, feats, dims.n_text_head)
            cache = KVCache(
                *init_kv_cache(dims, tokens.shape[0], model.dtype), ck, cv
            )
            logits, _, cross_qk = decoder_forward(
                params,
                tokens,
                cache,
                jnp.int32(0),
                dims.n_text_head,
                capture_cross_qk=True,
            )
            text_probs = jax.nn.softmax(
                logits[:, :-1, :eot].astype(jnp.float32), axis=-1
            )
            safe = jnp.clip(tokens[:, 1:], 0, eot - 1)
            probs = jnp.take_along_axis(text_probs, safe[..., None], -1)[
                ..., 0
            ]
            sel = jnp.stack(
                [cross_qk[l][:, h] for l, h in heads], axis=0
            )  # [A, B, L, 1500]
            return probs, sel

        fn = _run
        model._timing_capture_jit = fn
        model._timing_capture_key = key

    probs, sel = fn(model.params, tokens, mels)
    return np.asarray(probs, np.float32), np.asarray(sel, np.float32)


def _alignment_from_capture(
    probs_row: np.ndarray,
    cqk_row: np.ndarray,
    text_tokens: List[int],
    num_frames: int,
    model,
    tokenizer,
    medfilt_width: int,
    qk_scale: float,
) -> List[WordTiming]:
    """Per-window post-processing: softmax/z-norm/medfilt over the
    alignment heads, DTW, token→word grouping. ``probs_row`` [T_row-1]
    (device-computed next-token probabilities) and ``cqk_row``
    [A, T_row, 1500] (pre-selected alignment heads) must already be
    sliced to the row's true token length."""
    sot_len = len(tokenizer.sot_sequence)
    text_token_probs = probs_row[
        sot_len : sot_len + len(text_tokens)
    ].tolist()

    heads = cqk_row[:, :, : num_frames // 2]  # [A, T_row, frames]
    weights = _softmax(heads * qk_scale)  # over frames
    mean = weights.mean(axis=-2, keepdims=True)
    std = weights.std(axis=-2, keepdims=True) + 1e-9
    weights = (weights - mean) / std
    # host median filter: the per-window tensor is tiny (A×T×frames) and a
    # device round-trip per window costs a ~30 ms tunnel dispatch each —
    # measured to dominate the words path (the jnp kernel remains for
    # batched device-resident callers)
    weights = _median_filter_np(weights, medfilt_width)

    matrix = weights.mean(axis=0)  # [T_row, frames]
    matrix = matrix[sot_len:-1]  # rows for text tokens + eot

    text_indices, time_indices = dtw(-matrix)

    words, word_tokens = tokenizer.split_to_word_tokens(
        list(text_tokens) + [tokenizer.eot]
    )
    if len(word_tokens) <= 1:
        return []
    word_boundaries = np.pad(
        np.cumsum([len(t) for t in word_tokens[:-1]]), (1, 0)
    )

    jumps = np.pad(np.diff(text_indices), (1, 0), constant_values=1).astype(bool)
    jump_times = time_indices[jumps] / TOKENS_PER_SECOND
    start_times = jump_times[word_boundaries[:-1]]
    end_times = jump_times[word_boundaries[1:]]
    word_probabilities = [
        float(np.mean(text_token_probs[i:j])) if j > i else 0.0
        for i, j in zip(word_boundaries[:-1], word_boundaries[1:])
    ]

    return [
        WordTiming(word, tokens_, float(start), float(end), probability)
        for word, tokens_, start, end, probability in zip(
            words[:-1], word_tokens[:-1], start_times, end_times, word_probabilities
        )
    ]


def find_alignment(
    model,
    tokenizer,
    text_tokens: List[int],
    mel: jnp.ndarray,
    num_frames: int,
    *,
    medfilt_width: int = MEDFILT_WIDTH,
    qk_scale: float = QK_SCALE,
) -> List[WordTiming]:
    """mel: [T=3000, n_mels] single segment. Returns per-word timings."""
    if len(text_tokens) == 0:
        return []
    tokens, lengths = _teacher_forced_rows(tokenizer, [text_tokens])
    probs, cqk = _capture_cross_qk(
        model, tokens, jnp.asarray(mel)[None], tokenizer.eot
    )
    n = lengths[0]
    return _alignment_from_capture(
        probs[0, : n - 1],
        cqk[:, 0, :n],
        text_tokens,
        num_frames,
        model,
        tokenizer,
        medfilt_width,
        qk_scale,
    )


def find_alignment_batch(
    model,
    tokenizer,
    text_token_lists: List[List[int]],
    mels,
    num_frames_list: List[int],
    *,
    medfilt_width: int = MEDFILT_WIDTH,
    qk_scale: float = QK_SCALE,
) -> List[List[WordTiming]]:
    """Word timings for many 30 s windows with ONE teacher-forced device
    call per group (vs the reference's per-sample loop at
    mlx_ultra_optimized_batch.py:155-197). ``mels``: [N, 3000, n_mels].
    Group size bounds the captured cross-QK HBM footprint
    (layers × B × heads × L × 1500 f32); override with
    WHISPERX_TPU_ALIGN_BATCH."""
    import os

    n = len(text_token_lists)
    results: List[List[WordTiming]] = [[] for _ in range(n)]
    live = [i for i in range(n) if len(text_token_lists[i]) > 0]
    if not live:
        return results
    group = max(1, int(os.environ.get("WHISPERX_TPU_ALIGN_BATCH", "8")))
    mels = jnp.asarray(mels)
    for base in range(0, len(live), group):
        idxs = live[base : base + group]
        tokens, lengths = _teacher_forced_rows(
            tokenizer, [text_token_lists[i] for i in idxs]
        )
        probs, cqk = _capture_cross_qk(
            model, tokens, mels[jnp.asarray(idxs)], tokenizer.eot
        )
        for j, i in enumerate(idxs):
            L = lengths[j]
            results[i] = _alignment_from_capture(
                probs[j, : L - 1],
                cqk[:, j, :L],
                text_token_lists[i],
                num_frames_list[i],
                model,
                tokenizer,
                medfilt_width,
                qk_scale,
            )
    return results


def _median_filter_np(x: np.ndarray, width: int) -> np.ndarray:
    """Reflect-padded sliding median over the last axis (numpy; matches
    timing.dtw.median_filter — pinned by tests/test_timing.py)."""
    pad = width // 2
    padded = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    win = np.lib.stride_tricks.sliding_window_view(padded, width, axis=-1)
    return np.median(win, axis=-1).astype(x.dtype)


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def merge_punctuations(
    alignment: List[WordTiming], prepended: str, appended: str
) -> None:
    """Attach leading/trailing punctuation to neighbouring words in place
    (whisper semantics)."""
    i = len(alignment) - 2
    j = len(alignment) - 1
    while i >= 0:
        previous = alignment[i]
        following = alignment[j]
        if previous.word.startswith(" ") and previous.word.strip() in prepended:
            following.word = previous.word + following.word
            following.tokens = previous.tokens + following.tokens
            previous.word = ""
            previous.tokens = []
        else:
            j = i
        i -= 1

    i = 0
    j = 1
    while j < len(alignment):
        previous = alignment[i]
        following = alignment[j]
        if not previous.word.endswith(" ") and following.word in appended:
            previous.word = previous.word + following.word
            previous.tokens = previous.tokens + following.tokens
            following.word = ""
            following.tokens = []
        else:
            i = j
        j += 1


def add_word_timestamps(
    *,
    segments: List[dict],
    model,
    tokenizer,
    mel: jnp.ndarray,
    num_frames: int,
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
    last_speech_timestamp: float = 0.0,
) -> None:
    """Attach ``words`` lists to segments in place (whisper semantics;
    contract per SURVEY.md §2.9 timing row)."""
    if len(segments) == 0:
        return

    text_tokens_per_segment = [
        [t for t in segment["tokens"] if t < tokenizer.eot]
        for segment in segments
    ]
    text_tokens = [t for seg in text_tokens_per_segment for t in seg]
    alignment = find_alignment(model, tokenizer, text_tokens, mel, num_frames)
    _attach_word_timings(
        segments,
        text_tokens_per_segment,
        alignment,
        prepend_punctuations,
        append_punctuations,
        last_speech_timestamp,
    )


def add_word_timestamps_batched(
    *,
    chunk_segments: List[List[dict]],
    model,
    tokenizer,
    mels,
    num_frames_list: List[int],
    prepend_punctuations: str = "\"'“¿([{-",
    append_punctuations: str = "\"'.。,，!！?？:：”)]}、",
) -> None:
    """Batched-mode word timing: one chunk = one 30 s window; all windows'
    teacher-forced captures are batched on device (find_alignment_batch),
    then each chunk's segments get words attached independently (chunks are
    separate VAD regions, so last_speech_timestamp doesn't carry across)."""
    token_lists = []
    for segs in chunk_segments:
        toks = [
            t
            for seg in segs
            for t in seg["tokens"]
            if t < tokenizer.eot
        ]
        token_lists.append(toks)
    alignments = find_alignment_batch(
        model, tokenizer, token_lists, mels, num_frames_list
    )
    for segs, alignment in zip(chunk_segments, alignments):
        if not segs:
            continue
        text_tokens_per_segment = [
            [t for t in seg["tokens"] if t < tokenizer.eot] for seg in segs
        ]
        _attach_word_timings(
            segs,
            text_tokens_per_segment,
            alignment,
            prepend_punctuations,
            append_punctuations,
            # word times are absolute (chunk offset applied); the chunk's
            # own start is the no-previous-speech baseline — 0.0 would
            # make the first-word duration-anomaly gate always fire for
            # any chunk away from t=0
            min(seg["start"] for seg in segs),
        )


def _attach_word_timings(
    segments: List[dict],
    text_tokens_per_segment: List[List[int]],
    alignment: List[WordTiming],
    prepend_punctuations: str,
    append_punctuations: str,
    last_speech_timestamp: float,
) -> None:
    word_durations = np.array(
        [t.end - t.start for t in alignment if t.end > t.start]
    )
    median_duration = (
        float(np.median(word_durations)) if len(word_durations) > 0 else 0.0
    )
    median_duration = min(0.7, median_duration)
    max_duration = median_duration * 2

    # truncate long words at sentence boundaries (hallucination guard)
    if len(word_durations) > 0:
        sentence_end_marks = ".。!！?？"
        for i in range(1, len(alignment)):
            if alignment[i].end - alignment[i].start > max_duration:
                if alignment[i].word in sentence_end_marks:
                    alignment[i].end = alignment[i].start + max_duration
                elif i > 0 and alignment[i - 1].word in sentence_end_marks:
                    alignment[i].start = alignment[i].end - max_duration

    merge_punctuations(alignment, prepend_punctuations, append_punctuations)

    time_offset = segments[0]["seek"] * HOP_LENGTH / SAMPLE_RATE
    word_index = 0

    for segment, seg_text_tokens in zip(segments, text_tokens_per_segment):
        saved_tokens = 0
        words = []
        while word_index < len(alignment) and saved_tokens < len(seg_text_tokens):
            timing = alignment[word_index]
            word_index += 1
            if timing.word:
                words.append(
                    {
                        "word": timing.word,
                        "start": round(time_offset + timing.start, 2),
                        "end": round(time_offset + timing.end, 2),
                        "probability": timing.probability,
                    }
                )
            saved_tokens += len(timing.tokens)

        # duration-anomaly fixes at segment edges (whisper heuristics)
        if len(words) > 0:
            if (
                words[0]["end"] - last_speech_timestamp > median_duration * 4
                and (
                    words[0]["end"] - words[0]["start"] > max_duration
                    or (
                        len(words) > 1
                        and words[1]["end"] - words[0]["start"] > max_duration * 2
                    )
                )
            ):
                if (
                    len(words) > 1
                    and words[1]["end"] - words[1]["start"] > max_duration
                ):
                    boundary = max(
                        words[1]["end"] / 2, words[1]["end"] - max_duration
                    )
                    words[0]["end"] = words[1]["start"] = boundary
                words[0]["start"] = max(0, words[0]["end"] - max_duration)

            if (
                segment["start"] < words[0]["end"]
                and segment["start"] - 0.5 > words[0]["start"]
            ):
                words[0]["start"] = max(
                    0, min(words[0]["end"] - median_duration, segment["start"])
                )
            else:
                segment["start"] = words[0]["start"]

            if (
                segment["end"] > words[-1]["start"]
                and segment["end"] + 0.5 < words[-1]["end"]
            ):
                words[-1]["end"] = max(
                    words[-1]["start"] + median_duration, segment["end"]
                )
            else:
                segment["end"] = words[-1]["end"]

            last_speech_timestamp = segment["end"]

        segment["words"] = words


__all__ = [
    "WordTiming",
    "add_word_timestamps",
    "add_word_timestamps_batched",
    "dtw",
    "find_alignment",
    "find_alignment_batch",
    "median_filter",
    "merge_punctuations",
]
