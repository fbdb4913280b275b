"""ASR pipeline: VAD segmentation + truly-batched Whisper decode.

TPU-native redesign of reference whisperx/asr.py:19-275. The reference's
"batch" backend is a pseudo-batch (sequential per-segment transcribe,
mlx_simple.py:154-194); here VAD chunks are decoded as REAL device batches:

  1. one log-mel over the whole file (the lightning trick,
     mlx_lightning.py:162-217), sliced per merged VAD chunk;
  2. chunks packed into fixed-size batches (padded — static shapes, one
     XLA compile per batch size);
  3. a single jitted decode per batch (encoder + prefill + while_loop);
  4. temperature fallback re-batches only the failing chunks
     (compression-ratio / logprob / no-speech gates per segment), instead
     of the reference's per-segment sequential fallback.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from whisperx_tpu.audio import (
    N_FRAMES,
    SAMPLE_RATE,
    load_audio,
    log_mel_spectrogram,
    pad_or_trim,
)
from whisperx_tpu.decoding import DecodingOptions, decode, get_tokenizer
from whisperx_tpu.decoding.decode import decode_dispatch, decode_finalize
from whisperx_tpu.decoding.decode import detect_language as _detect_language
from whisperx_tpu.types import TranscriptionResult
from whisperx_tpu.utils.languages import normalize_language
from whisperx_tpu.vad import load_vad_model, merge_chunks

DEFAULT_ASR_OPTIONS = {
    "beam_size": None,
    "best_of": None,
    "patience": None,
    "length_penalty": None,
    "temperatures": (0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
    "compression_ratio_threshold": 2.4,
    "log_prob_threshold": -1.0,
    "no_speech_threshold": 0.6,
    "condition_on_previous_text": False,
    "initial_prompt": None,
    "suppress_tokens": "-1",
    "suppress_blank": True,
    # timestamps ON by default: the batched path splits each 30 s chunk
    # into timestamped sub-segments (reference sequential-backend quality)
    "without_timestamps": False,
    "max_initial_timestamp": 1.0,
    "word_timestamps": False,
    # evict low-confidence segments surrounded by silence (requires
    # word_timestamps; reference option surface: mlx_whisper.py:84)
    "hallucination_silence_threshold": None,
    "sample_len": None,  # max tokens per chunk (None = n_text_ctx // 2)
    "suppress_numerals": False,
    # int8 cross-KV cache: ~30% faster decode step (halves its dominant
    # HBM read); token-identical on test configs, generally lossless at
    # per-channel granularity
    "kv_quant": True,
    # speculative decoding: a draft Whisper (model name, checkpoint path,
    # or Whisper instance — e.g. a distil variant sharing the vocabulary)
    # drafts spec_gamma tokens per target verify pass. Greedy verification
    # keeps the output token-identical to plain greedy decoding; applies
    # to the batched temperature-0 path (fallback temps decode normally).
    "draft_model": None,
    "spec_gamma": 4,
}

DEFAULT_VAD_OPTIONS = {
    "chunk_size": 30,
    "vad_onset": 0.500,
    "vad_offset": 0.363,
}


from whisperx_tpu.audio.device_chunk import (  # noqa: E402
    DeviceAudio,
    chunk_mels,
    to_device as _audio_to_device,
    upload_audio,
)


def warmup_audio(duration_s: float = 65.0) -> np.ndarray:
    """Synthetic speech-like signal for compile warmup: a speech-band
    carrier with syllable-rate (3 Hz) amplitude modulation — loud and
    modulated enough to trip every VAD backend, so the warmup decode
    actually runs. Deterministic, so repeated warmups hit the same
    programs."""
    t = np.arange(int(duration_s * SAMPLE_RATE), dtype=np.float32) / np.float32(
        SAMPLE_RATE
    )
    carrier = 0.3 * np.sin(2 * np.pi * 220.0 * t) + 0.2 * np.sin(
        2 * np.pi * 440.0 * t
    )
    return (carrier * (0.55 + 0.45 * np.sin(2 * np.pi * 3.0 * t))).astype(
        np.float32
    )


def _max_decode_rows(model, *, kv_quant: bool = False, sample_len: Optional[int] = None) -> int:
    """Max concurrent decode rows (batch × beam/best_of tiles) whose KV
    working set fits the HBM cache budget.

    Per-row decode-time cache = cross-KV (2 · n_layer · 1500 frames · d)
    + self-KV (2 · n_layer · cache_len · d), where cache_len mirrors the
    allocation decode.py actually makes: prefix + sample_len + 1, rounded
    up to 64, capped at n_text_ctx. Budget defaults to 8 GiB (v5e-class
    HBM minus weights/activations headroom); override with
    WHISPERX_TPU_KV_HBM_GB. Replaces the former fixed 32-row cap that
    treated tiny-fp32 and large-v3-int8 identically.
    """
    import os

    dims = model.dims
    d = dims.n_text_state
    n_layer = dims.n_text_layer
    cross_bytes = 1 if kv_quant else 2  # int8 vs bf16 cross-KV
    if sample_len is None:
        sample_len = dims.n_text_ctx // 2  # decode.py default
    # prefix budget: sot sequence + optional prompt ≈ 8 tokens typical;
    # decode.py rounds (n_init + sample_len + 1) up to 64, cap n_text_ctx
    budget_tokens = 8 + sample_len + 1
    cache_len = min(dims.n_text_ctx, -(-budget_tokens // 64) * 64)
    per_row = 2 * n_layer * d * (1500 * cross_bytes + cache_len * 2)
    budget = float(os.environ.get("WHISPERX_TPU_KV_HBM_GB", "8")) * 2**30
    return max(1, int(budget // per_row))


@dataclass
class TranscriptionPipeline:
    """VAD → batched ASR pipeline (role of reference MLXWhisperPipeline)."""

    model: object
    vad_model: Optional[object] = None
    asr_options: dict = field(default_factory=dict)
    language: Optional[str] = None
    task: str = "transcribe"
    batch_size: int = 8
    decode_mode: str = "batched"  # "batched" | "sequential"

    def __post_init__(self):
        self.asr_options = {**DEFAULT_ASR_OPTIONS, **(self.asr_options or {})}
        self._spec_decoder = None
        if (
            self.asr_options.get("draft_model") is not None
            and self.asr_options.get("beam_size") is not None
        ):
            # speculative decoding is greedy-only (token-identical to
            # greedy); beam search would silently win the gate and the
            # draft model would never load — make the choice explicit
            import warnings

            warnings.warn(
                "draft_model requests speculative decoding, which is "
                "greedy-only; ignoring beam_size="
                f"{self.asr_options['beam_size']}."
            )
            self.asr_options["beam_size"] = None

    def _spec(self):
        """Lazily build the SpeculativeDecoder when a draft model is
        configured (CLI --draft_model / asr_options['draft_model'])."""
        if self.asr_options.get("draft_model") is None:
            return None
        if self._spec_decoder is None:
            from whisperx_tpu.decoding.speculative import SpeculativeDecoder

            draft = self.asr_options["draft_model"]
            if isinstance(draft, str) and draft.startswith("self:"):
                # "self:N" — draft from the target's own first N decoder
                # layers (weights shared, no second checkpoint). The
                # mechanism is exact (output token-identical to plain
                # greedy); the SPEEDUP depends on how often the early-exit
                # logits agree with the full model, which is model- and
                # data-dependent — distil drafts are the recommended
                # production configuration.
                from whisperx_tpu.decoding.speculative import (
                    truncated_self_draft,
                )

                draft = truncated_self_draft(
                    self.model, int(draft.split(":", 1)[1])
                )
            elif isinstance(draft, str):
                from whisperx_tpu.models.whisper import load_model as _load

                draft = _load(draft, dtype=self.model.dtype)
            gamma = int(self.asr_options.get("spec_gamma") or 4)
            self._spec_decoder = SpeculativeDecoder(
                self.model, draft, gamma=gamma
            )
        return self._spec_decoder

    # ------------------------------------------------------------------

    def detect_language(self, audio: np.ndarray) -> str:
        from whisperx_tpu.audio import N_SAMPLES

        head = np.asarray(pad_or_trim(audio, N_SAMPLES), np.float32)
        mel = np.asarray(log_mel_spectrogram(head, self.model.dims.n_mels))
        tok = get_tokenizer(
            self.model.is_multilingual,
            num_languages=self.model.num_languages,
            vocab_path=self.model.vocab_path,
        )
        codes, _ = _detect_language(self.model, jnp.asarray(mel.T)[None], tok)
        return codes[0]

    # ------------------------------------------------------------------

    def warmup(
        self,
        batch_size: Optional[int] = None,
        duration_s: float = 65.0,
    ) -> TranscriptionResult:
        """Compile the serving-path XLA programs before real traffic.

        Drives the real public path (upload → VAD → mel gather → padded
        batch decode → timestamp filters, plus language detection when no
        language is pinned) on synthetic speech, so the first user
        request doesn't pay the multi-minute first-compile of the decode
        program. ~65 s of audio yields multiple VAD chunks, compiling the
        mel gather and the padded decode batch at their steady-state
        shapes. The synthetic signal is a speech-band carrier with
        syllable-rate amplitude modulation — loud and modulated enough to
        trip every VAD backend. Returns the (meaningless) result so
        callers can sanity-check structure. No reference counterpart: the
        reference pays compile-on-first-request (mlx is eager); XLA's
        trace-once model makes warmup a first-class serving concern."""
        return self.transcribe(
            warmup_audio(duration_s), batch_size=batch_size
        )

    def transcribe(
        self,
        audio: Union[str, np.ndarray],
        batch_size: Optional[int] = None,
        chunk_size: int = 30,
        language: Optional[str] = None,
        task: Optional[str] = None,
        print_progress: bool = False,
        combined_progress: bool = False,
        verbose: bool = False,
        initial_prompt: Optional[str] = None,
        **kwargs,
    ) -> TranscriptionResult:
        # Per-call ASR option overrides (e.g. word_timestamps=True for one
        # file): keys must exist in DEFAULT_ASR_OPTIONS — a typo'd option
        # silently doing nothing is worse than an error. Applied by a
        # scoped swap of self.asr_options (the pipeline serializes
        # transcribe calls; serve/ holds its own lock).
        if kwargs:
            unknown = set(kwargs) - set(DEFAULT_ASR_OPTIONS)
            if unknown:
                raise TypeError(
                    f"Unknown transcribe option(s): {sorted(unknown)}. "
                    "Valid keys are those of DEFAULT_ASR_OPTIONS."
                )
            saved_options = self.asr_options
            self.asr_options = {**saved_options, **kwargs}
            try:
                return self.transcribe(
                    audio,
                    batch_size=batch_size,
                    chunk_size=chunk_size,
                    language=language,
                    task=task,
                    print_progress=print_progress,
                    combined_progress=combined_progress,
                    verbose=verbose,
                    initial_prompt=initial_prompt,
                )
            finally:
                self.asr_options = saved_options
        if isinstance(audio, str):
            audio = load_audio(audio)
        audio = np.asarray(audio, np.float32)
        batch_size = batch_size or self.batch_size
        language = normalize_language(language or self.language)
        task = task or self.task

        from whisperx_tpu.utils.metrics import GLOBAL_TRACKER as _tracker

        if self.vad_model is None:
            # No VAD: full sequential seek-loop transcription.
            from whisperx_tpu.decoding.transcribe import transcribe as seq_transcribe

            opts = self._seq_options(initial_prompt=initial_prompt)
            result = seq_transcribe(
                model=self.model,
                audio=audio,
                language=language,
                task=task,
                verbose=verbose if verbose else None,
                **opts,
            )
            return {
                "segments": [
                    {
                        "start": s["start"],
                        "end": s["end"],
                        "text": s["text"],
                        # word_timestamps=True attaches words — keep them
                        **({"words": s["words"]} if "words" in s else {}),
                    }
                    for s in result["segments"]
                ],
                "language": result["language"],
            }

        # Device-side chunking: ONE upload of the raw waveform; VAD probs,
        # chunk slicing, and mels all read the resident array.
        with _tracker.track("upload", len(audio) / SAMPLE_RATE):
            audio_dev = upload_audio(audio)
            # barrier: device_put is async, and without it the transfer's
            # tail lands in whatever stage touches the array first — the
            # round-4 profile showed "vad: 3.0 s" that was really ~2.4 s
            # of upload + 0.06 s of actual VAD. device_get, not
            # block_until_ready: only a real readback is a reliable
            # barrier through the device tunnel (docs/PERFORMANCE.md)
            np.asarray(audio_dev.data[:1])
        with _tracker.track("vad", len(audio) / SAMPLE_RATE):
            chunks = self._segment_with_vad(audio_dev, chunk_size)
        if not chunks:
            return {"segments": [], "language": language or "en"}

        if language is None:
            if self.model.is_multilingual:
                first = chunks[0]
                s0 = int(first["start"] * SAMPLE_RATE)
                e0 = int(first["end"] * SAMPLE_RATE)
                language = self.detect_language(audio[s0:e0])
                if print_progress or verbose:
                    print(f"Detected language: {language}")
            else:
                language = "en"

        if self.decode_mode == "sequential":
            segments = self._transcribe_chunks_sequential(
                audio, chunks, language=language, task=task, verbose=verbose,
                initial_prompt=initial_prompt,
            )
        else:
            segments = self._transcribe_chunks(
                audio_dev,
                chunks,
                batch_size=batch_size,
                language=language,
                task=task,
                print_progress=print_progress,
                verbose=verbose,
                initial_prompt=initial_prompt,
            )
        return {"segments": segments, "language": language}

    def transcribe_many(
        self,
        audios: List[np.ndarray],
        *,
        batch_size: Optional[int] = None,
        chunk_size: float = 30,
        language: Optional[Union[str, List[Optional[str]]]] = None,
        task: Optional[Union[str, List[Optional[str]]]] = None,
        initial_prompt: Optional[Union[str, List[Optional[str]]]] = None,
    ) -> List[TranscriptionResult]:
        """Cross-request coalescing: VAD every audio, pool ALL requests'
        chunks into one shared decode stream (chunks from different
        requests fill the same device batch), then demux segments back per
        request. This is what makes the serving layer a serving layer —
        the reference batches across requests too
        (mlx_continuous_batching.py:229-304), but loops the actual decode.

        ``language`` / ``task`` / ``initial_prompt`` may be a single value
        for all requests or a per-request list (None entries auto-detect /
        default); requests are grouped by (language, task, prompt) and
        each group shares device batches (the prompt conditions the decode
        prefix, so it must be uniform within a device batch).
        """
        import bisect
        import math

        n_req = len(audios)

        def _per_request(opt, default):
            if isinstance(opt, (list, tuple)):
                if len(opt) != n_req:
                    raise ValueError(
                        f"per-request option length {len(opt)} != {n_req} requests"
                    )
                return [v if v is not None else default for v in opt]
            return [opt if opt is not None else default] * n_req

        batch_size = batch_size or self.batch_size
        req_tasks = _per_request(task, self.task)
        req_prompts = [
            tuple(p) if isinstance(p, list) else p
            for p in _per_request(initial_prompt, None)
        ]  # tuples: prompts key decode groups, so they must be hashable
        req_langs = [
            normalize_language(lg)
            for lg in _per_request(language, self.language)
        ]
        audios = [np.asarray(a, np.float32) for a in audios]
        if not audios:
            return []
        if self.vad_model is None:
            # the seek loop is stateful per audio; nothing to coalesce
            return [
                self.transcribe(
                    a,
                    batch_size=batch_size,
                    chunk_size=chunk_size,
                    language=lg,
                    task=tk,
                    initial_prompt=pr,
                )
                for a, lg, tk, pr in zip(
                    audios, req_langs, req_tasks, req_prompts
                )
            ]

        from whisperx_tpu.utils.metrics import GLOBAL_TRACKER as _tracker

        devs = [upload_audio(a) for a in audios]
        with _tracker.track("vad", sum(len(a) for a in audios) / SAMPLE_RATE):
            per_chunks = [self._segment_with_vad(d, chunk_size) for d in devs]

        # Per-request language: explicit value if the caller gave one,
        # otherwise detected for each request — all detections share ONE
        # batched device call (each round-trip costs tens of ms through
        # the tunnel); same-(language, task) requests then share device
        # batches within their group.
        langs: List[Optional[str]] = []
        detect_idx: List[int] = []
        for r, (chs, lg) in enumerate(zip(per_chunks, req_langs)):
            if lg is not None:
                langs.append(lg)
            elif not chs or not self.model.is_multilingual:
                langs.append("en")
            else:
                langs.append(None)
                detect_idx.append(r)
        if detect_idx:
            n_mels = self.model.dims.n_mels
            first_mels = jnp.concatenate(
                [
                    chunk_mels(devs[r], per_chunks[r][:1], n_mels)
                    for r in detect_idx
                ],
                axis=0,
            )
            tok = get_tokenizer(
                self.model.is_multilingual,
                num_languages=self.model.num_languages,
                vocab_path=self.model.vocab_path,
            )
            codes, _ = _detect_language(self.model, first_mels, tok)
            for r, code in zip(detect_idx, codes):
                langs[r] = code

        # lay the requests out on one virtual timeline (whole-second bases
        # with a 1 s guard gap) so timestamps demux back per request; the
        # audio itself never materializes on that timeline — chunk mels are
        # gathered per request from each resident waveform and concatenated
        bases: List[float] = []
        offset = 0.0
        for a in audios:
            bases.append(offset)
            offset += math.ceil(len(a) / SAMPLE_RATE) + 1.0

        results: List[TranscriptionResult] = [
            {"segments": [], "language": lg} for lg in langs
        ]
        n_mels = self.model.dims.n_mels
        groups: dict = {}
        for r, lg in enumerate(langs):
            if per_chunks[r]:
                groups.setdefault(
                    (lg, req_tasks[r], req_prompts[r]), []
                ).append(r)

        for (lg, tk, prompt), req_idxs in groups.items():
            pooled: List[dict] = []
            mel_parts = []
            group_bases = [bases[r] for r in req_idxs]
            for r in req_idxs:
                for ch in per_chunks[r]:
                    pooled.append(
                        {
                            "start": ch["start"] + bases[r],
                            "end": ch["end"] + bases[r],
                            "segments": ch.get("segments", []),
                        }
                    )
                mel_parts.append(chunk_mels(devs[r], per_chunks[r], n_mels))
            mels = (
                jnp.concatenate(mel_parts, axis=0)
                if len(mel_parts) > 1
                else mel_parts[0]
            )
            segments = self._transcribe_chunks(
                None, pooled, batch_size=batch_size, language=lg, task=tk,
                mels=mels, initial_prompt=prompt,
            )
            for seg in segments:
                g = bisect.bisect_right(group_bases, seg["start"] + 1e-6) - 1
                r = req_idxs[g]
                out = dict(seg)
                out["start"] = round(seg["start"] - bases[r], 3)
                out["end"] = round(seg["end"] - bases[r], 3)
                if "words" in seg:
                    out["words"] = [
                        {
                            **w,
                            "start": round(w["start"] - bases[r], 2),
                            "end": round(w["end"] - bases[r], 2),
                        }
                        for w in seg["words"]
                    ]
                results[r]["segments"].append(out)
        return results

    def _transcribe_chunks_sequential(
        self,
        audio: np.ndarray,
        chunks: List[dict],
        *,
        language: str,
        task: str,
        verbose: bool = False,
        initial_prompt: Optional[str] = None,
    ) -> List[dict]:
        """Per-chunk seek-loop transcription with timestamp offsetting —
        the reference's sequential backend path (mlx_simple.py:154-194),
        kept for quality-maximal decoding of each VAD window."""
        from whisperx_tpu.decoding.transcribe import transcribe as seq_transcribe

        opts = self._seq_options(initial_prompt=initial_prompt)
        segments: List[dict] = []
        for ch in chunks:
            s = int(ch["start"] * SAMPLE_RATE)
            e = int(ch["end"] * SAMPLE_RATE)
            result = seq_transcribe(
                model=self.model,
                audio=audio[s:e],
                language=language,
                task=task,
                verbose=verbose if verbose else None,
                **opts,
            )
            win = ch["end"] - ch["start"]
            for seg in result["segments"]:
                # clamp to the chunk's real extent (see _transcribe_chunks)
                if seg["start"] >= win:
                    continue
                end_rel = min(seg["end"], win)
                if end_rel <= seg["start"]:
                    continue
                entry = {
                    "start": round(seg["start"] + ch["start"], 3),
                    "end": round(end_rel + ch["start"], 3),
                    "text": seg["text"],
                }
                if "words" in seg:
                    # words come back chunk-relative from seq_transcribe;
                    # shift to absolute so they agree with the segment times
                    # (the batched path does this via seg['seek'] in timing/).
                    # Words at/past the clamped segment extent are dropped
                    # (a word starting at >= end_rel would invert once its
                    # end is clamped), mirroring the segment-level clamp.
                    entry["words"] = [
                        {
                            **w,
                            **(
                                {
                                    "start": round(
                                        min(w["start"], end_rel) + ch["start"], 3
                                    ),
                                    "end": round(
                                        min(w["end"], end_rel) + ch["start"], 3
                                    ),
                                }
                                if "start" in w and "end" in w
                                else {}
                            ),
                        }
                        for w in seg["words"]
                        if not (
                            "start" in w
                            and "end" in w
                            and w["start"] >= end_rel
                        )
                    ]
                segments.append(entry)
        return segments

    # ------------------------------------------------------------------

    def _seq_options(self, initial_prompt: Optional[str] = None) -> dict:
        o = self.asr_options
        if initial_prompt is None:
            initial_prompt = o["initial_prompt"]
        return {
            "temperature": o["temperatures"],
            "compression_ratio_threshold": o["compression_ratio_threshold"],
            "logprob_threshold": o["log_prob_threshold"],
            "no_speech_threshold": o["no_speech_threshold"],
            "condition_on_previous_text": o["condition_on_previous_text"],
            "initial_prompt": initial_prompt,
            "word_timestamps": o["word_timestamps"],
            "hallucination_silence_threshold": o.get(
                "hallucination_silence_threshold"
            ),
            "beam_size": o["beam_size"],
            "best_of": o["best_of"],
            "suppress_tokens": o["suppress_tokens"],
        }

    def _segment_with_vad(self, audio, chunk_size: float) -> List[dict]:
        """``audio``: host numpy OR an uploaded ``DeviceAudio``. Device
        audio goes straight to device-capable VADs (only the prob vector
        comes back over the tunnel); others get the host array."""
        if isinstance(audio, DeviceAudio):
            if getattr(self.vad_model, "supports_device_audio", False):
                payload = {
                    "waveform": audio.data,
                    "sample_rate": SAMPLE_RATE,
                    "length": audio.length,
                }
            else:
                payload = {
                    "waveform": np.asarray(audio.data)[: audio.length],
                    "sample_rate": SAMPLE_RATE,
                }
        else:
            payload = {"waveform": audio, "sample_rate": SAMPLE_RATE}
        vad_segments = self.vad_model(payload, max_speech_duration_s=chunk_size)
        if not vad_segments:
            return []
        onset = getattr(self.vad_model, "vad_onset", 0.5)
        offset = getattr(self.vad_model, "vad_offset", 0.363)
        return merge_chunks(vad_segments, chunk_size, onset=onset, offset=offset)

    def _transcribe_chunks(
        self,
        audio,
        chunks: List[dict],
        *,
        batch_size: int,
        language: str,
        task: str,
        print_progress: bool = False,
        verbose: bool = False,
        mels: Optional[jnp.ndarray] = None,
        initial_prompt: Optional[str] = None,
    ) -> List[dict]:
        from whisperx_tpu.utils.metrics import GLOBAL_TRACKER as _tracker

        o = self.asr_options
        if initial_prompt is None:
            initial_prompt = o["initial_prompt"]
        n_mels = self.model.dims.n_mels

        # One mel per chunk, gathered ON DEVICE from the resident waveform
        # (audio/device_chunk.py). Chunk audio is zero-padded to exactly
        # 30 s BEFORE the mel (whisper training-time semantics: silence has
        # a non-zero mel floor — zero-padding features instead would be
        # wrong) — which also gives a single static mel shape, so XLA
        # compiles the mel program once per chunk-count bucket. The host
        # never slices chunk samples; mels stay device-resident end to end.
        if mels is None:
            with _tracker.track("mel", sum(c["end"] - c["start"] for c in chunks)):
                audio_dev = upload_audio(audio)
                mels = chunk_mels(audio_dev, chunks, n_mels)

        temperatures = (
            [o["temperatures"]]
            if isinstance(o["temperatures"], (int, float))
            else list(o["temperatures"])
        )
        results: List[Optional[object]] = [None] * len(chunks)
        pending = list(range(len(chunks)))

        for t_idx, temperature in enumerate(temperatures):
            if not pending:
                break
            opts = DecodingOptions(
                task=task,
                language=language,
                temperature=temperature,
                sample_len=o["sample_len"],
                beam_size=o["beam_size"] if temperature == 0 else None,
                best_of=o["best_of"] if temperature > 0 else None,
                patience=o["patience"] if temperature == 0 else None,
                length_penalty=o["length_penalty"],
                prompt=(
                    self.model_prompt(initial_prompt) if initial_prompt else None
                ),
                suppress_tokens=o["suppress_tokens"],
                suppress_blank=o["suppress_blank"],
                suppress_numerals=o.get("suppress_numerals", False),
                kv_quant=o.get("kv_quant", True),
                without_timestamps=o["without_timestamps"],
                max_initial_timestamp=o["max_initial_timestamp"],
            )
            # beam search multiplies live decode rows by K, best_of sampling
            # by n candidates — cap the tiled row count so cross-KV + the
            # self-cache fit in the HBM cache budget (derived from model
            # dims, not a fixed constant)
            max_rows = _max_decode_rows(
                self.model, kv_quant=opts.kv_quant, sample_len=o["sample_len"]
            )
            tile = opts.beam_size or (
                int(opts.best_of) if opts.best_of and opts.best_of > 1 else 1
            )
            if tile > 1:
                bs_eff = max(1, min(batch_size, max_rows // tile))
            else:
                bs_eff = batch_size
            still_pending = []
            # speculative decoding serves the greedy (temperature-0,
            # un-tiled) batches; fallback temperatures decode normally
            spec = (
                self._spec()
                if (temperature == 0 and opts.beam_size is None and tile == 1)
                else None
            )
            # two-phase: dispatch every group first (JAX queues them on
            # device), then materialize — converting between groups would
            # leave the device idle during each host round-trip
            handles = []
            # dispatch phase is host-side tracing/queuing only (device
            # work lands in the finalize-phase "decode" stage)
            with _tracker.track("dispatch"):
                for base in range(0, len(pending), bs_eff):
                    idxs = pending[base : base + bs_eff]
                    rows = mels[jnp.asarray(idxs)]  # device gather
                    if len(idxs) < bs_eff:
                        rows = jnp.concatenate(
                            [
                                rows,
                                jnp.zeros(
                                    (bs_eff - len(idxs), N_FRAMES, n_mels),
                                    rows.dtype,
                                ),
                            ]
                        )
                    if spec is not None:
                        handles.append(
                            (
                                idxs,
                                spec.decode_batch_dispatch(
                                    rows, opts, n_real=len(idxs)
                                ),
                            )
                        )
                    else:
                        handles.append(
                            (idxs, decode_dispatch(self.model, rows, opts))
                        )
                    _tracker.add("batch_slots", bs_eff)
                    _tracker.add("batch_used", len(idxs))
            for gi, (idxs, handle) in enumerate(handles):
                with _tracker.track(
                    "decode", sum(chunks[i]["end"] - chunks[i]["start"] for i in idxs)
                ):
                    batch_results = (
                        spec.decode_batch_finalize(handle)
                        if spec is not None
                        else decode_finalize(handle)
                    )
                for j, idx in enumerate(idxs):
                    r = batch_results[j]
                    _tracker.add("tokens_decoded", len(r.tokens))
                    if t_idx < len(temperatures) - 1 and self._needs_fallback(r):
                        still_pending.append(idx)
                    else:
                        results[idx] = r
                if print_progress:
                    done = (
                        len(chunks)
                        - len(pending)
                        + (gi + 1) * bs_eff
                    )
                    print(f"Progress: {min(100, 100 * done // len(chunks))}%...")
            pending = still_pending

        from whisperx_tpu.audio.constants import FRAMES_PER_SECOND
        from whisperx_tpu.decoding.transcribe import split_timestamp_segments

        _t_tok = time.perf_counter()
        tokenizer = get_tokenizer(
            self.model.is_multilingual,
            num_languages=self.model.num_languages,
            language=language,
            task=task,
            vocab_path=self.model.vocab_path,
        )
        _tracker.observe("tokenizer", time.perf_counter() - _t_tok)
        with_timestamps = not o["without_timestamps"]

        chunk_segs: List[List[dict]] = [[] for _ in chunks]
        _t_assemble = time.perf_counter()
        for idx, (ch, r) in enumerate(zip(chunks, results)):
            if r is None:
                continue
            if (
                o["no_speech_threshold"] is not None
                and r.no_speech_prob > o["no_speech_threshold"]
                and (
                    o["log_prob_threshold"] is None
                    or r.avg_logprob < o["log_prob_threshold"]
                )
            ):
                continue  # silent chunk
            seek = int(round(ch["start"] * FRAMES_PER_SECOND))
            if with_timestamps and r.tokens:
                # split the window's decoded tokens into timestamped
                # sub-segments, exactly like the seek loop does — batched
                # mode no longer degrades to chunk-granular times
                subs, _, _ = split_timestamp_segments(
                    np.asarray(r.tokens, np.int64),
                    timestamp_begin=tokenizer.timestamp_begin,
                    segment_size=N_FRAMES,
                )
                win = ch["end"] - ch["start"]
                for s_rel, e_rel, toks in subs:
                    # clamp to the window's REAL audio extent: timestamps in
                    # the zero-padded tail of a short chunk transcribe
                    # silence, never speech
                    if s_rel >= win:
                        continue
                    e_rel = min(e_rel, win)
                    if e_rel <= s_rel:
                        continue
                    text = tokenizer.decode(toks).strip()
                    if not text:
                        continue
                    chunk_segs[idx].append(
                        {
                            "start": round(ch["start"] + s_rel, 3),
                            "end": round(ch["start"] + e_rel, 3),
                            "text": text,
                            "tokens": toks,
                            "seek": seek,
                        }
                    )
            else:
                text = r.text.strip()
                if not text:
                    continue
                chunk_segs[idx].append(
                    {
                        "start": round(ch["start"], 3),
                        "end": round(ch["end"], 3),
                        "text": text,
                        "tokens": list(r.tokens),
                        "seek": seek,
                    }
                )

        _tracker.observe("assemble", time.perf_counter() - _t_assemble)
        if o["word_timestamps"]:
            from whisperx_tpu.timing import add_word_timestamps_batched

            nf = [
                min(N_FRAMES, int(round((c["end"] - c["start"]) * FRAMES_PER_SECOND)))
                for c in chunks
            ]
            with _tracker.track(
                "word_timing", sum(c["end"] - c["start"] for c in chunks)
            ):
                add_word_timestamps_batched(
                    chunk_segments=chunk_segs,
                    model=self.model,
                    tokenizer=tokenizer,
                    mels=mels,
                    num_frames_list=nf,
                )
            hst = o.get("hallucination_silence_threshold")
            if hst is not None:
                # per-chunk anomaly eviction (reference parity: its batch
                # backend runs the full per-window hallucination logic
                # inside each chunk's transcribe call). Chunks are
                # VAD-bounded speech regions, so the seek-loop's
                # silence-skip re-decoding has nothing to skip — eviction
                # of surrounded anomalies is the meaningful part here.
                from whisperx_tpu.decoding.transcribe import (
                    evict_surrounded_anomalies,
                )

                for idx, ch in enumerate(chunks):
                    if not chunk_segs[idx]:
                        continue
                    kept, _ = evict_surrounded_anomalies(
                        chunk_segs[idx],
                        threshold=hst,
                        time_offset=ch["start"],
                        window_end_time=ch["end"],
                        segment_duration=ch["end"] - ch["start"],
                        last_speech_timestamp=ch["start"],
                        keep_tail=True,
                    )
                    chunk_segs[idx] = kept
        elif o.get("hallucination_silence_threshold") is not None:
            import warnings

            warnings.warn(
                "hallucination_silence_threshold requires "
                "word_timestamps=True; ignoring it."
            )

        segments = []
        for ch, segs in zip(chunks, chunk_segs):
            for seg in segs:
                if verbose:
                    print(f"[{seg['start']:.2f} --> {seg['end']:.2f}] {seg['text']}")
                out = {"start": seg["start"], "end": seg["end"], "text": seg["text"]}
                if "words" in seg:
                    out["words"] = seg["words"]
                segments.append(out)
        return segments

    def _needs_fallback(self, r) -> bool:
        o = self.asr_options
        crt = o["compression_ratio_threshold"]
        lpt = o["log_prob_threshold"]
        nst = o["no_speech_threshold"]
        if nst is not None and r.no_speech_prob > nst:
            return False  # silence: no point retrying hotter
        if crt is not None and np.isfinite(r.compression_ratio) and r.compression_ratio > crt:
            return True
        if lpt is not None and r.avg_logprob < lpt:
            return True
        return False

    def model_prompt(self, initial_prompt):
        """Prompt text → token ids. Pre-tokenized sequences pass through:
        shape-stable callers (streaming) bucket prompt lengths themselves,
        since every distinct prompt length is a distinct decode program."""
        if isinstance(initial_prompt, (list, tuple)):
            return list(initial_prompt)
        tok = get_tokenizer(
            self.model.is_multilingual,
            num_languages=self.model.num_languages,
            vocab_path=self.model.vocab_path,
        )
        return tok.encode(" " + initial_prompt.strip())


def load_model(
    whisper_arch: str,
    device: str = "tpu",
    device_index: int = 0,
    compute_type: str = "bfloat16",
    asr_options: Optional[dict] = None,
    language: Optional[str] = None,
    vad_method: Optional[str] = "silero",
    vad_options: Optional[dict] = None,
    task: str = "transcribe",
    download_root: Optional[str] = None,
    local_files_only: bool = False,
    threads: int = 4,
    backend: str = "auto",
    batch_size: int = 8,
    **kwargs,
) -> TranscriptionPipeline:
    """Load a Whisper pipeline (API parity: reference asr.py:150-275).

    ``compute_type``: bfloat16 (default) / float32 / float16 (mapped to
    bfloat16 on TPU) / int8 / int4 (weight-only quantized decode).
    """
    from whisperx_tpu.models.whisper import load_model as load_whisper
    from whisperx_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()

    dtype_map = {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.bfloat16,  # fp16 has no TPU advantage; bf16 is native
        "float32": jnp.float32,
    }
    quantization = None
    if compute_type in ("int8", "int4"):
        quantization = compute_type
        dtype = jnp.bfloat16
    else:
        dtype = dtype_map.get(compute_type, jnp.bfloat16)

    model = load_whisper(whisper_arch, dtype=dtype)
    if quantization is not None:
        from whisperx_tpu.quant import quantize_model

        model = quantize_model(model, mode=quantization)

    vad_model = None
    if vad_method and vad_method != "none":
        opts = {**DEFAULT_VAD_OPTIONS, **(vad_options or {})}
        vad_model = load_vad_model(
            vad_method,
            vad_onset=opts["vad_onset"],
            vad_offset=opts["vad_offset"],
            chunk_size=opts["chunk_size"],
        )

    decode_mode = (
        "sequential" if backend in ("sequential", "standard") else "batched"
    )
    return TranscriptionPipeline(
        model=model,
        vad_model=vad_model,
        asr_options=asr_options,
        language=normalize_language(language),
        task=task,
        batch_size=batch_size,
        decode_mode=decode_mode,
    )
