"""Batched autoregressive decoding for Whisper on TPU.

Replaces ``mlx_whisper.decoding`` (contract: SURVEY.md §2.9 rows 4-6) and
productionizes the reference's experimental true-batch decoder
(mlx_whisper_batch_decoder.py:317-468). TPU-native design:

  - the whole generate loop is ONE jitted program: encoder → cross-KV →
    prefill → ``lax.while_loop`` over decode steps with per-sequence EOT
    masking — no host round-trips per token;
  - all shapes static: token buffer [B, n_text_ctx], preallocated KV cache,
    padded batches (callers bucket batch sizes to avoid recompiles);
  - logit filters (whisperx_tpu.decoding.filters) run inside the loop in f32;
  - finished rows keep "decoding" EOT into masked slots instead of being
    gathered out — on TPU the wasted lanes are far cheaper than dynamic
    shapes (contrast reference's active-row extract/scatter at
    mlx_whisper_batch_decoder.py:64-100).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.decoding import filters as F
from whisperx_tpu.models.whisper.model import (
    KVCache,
    decoder_forward,
    encoder_forward,
    precompute_cross_kv,
)
from whisperx_tpu.utils.text import compression_ratio


@dataclass(frozen=True)
class DecodingOptions:
    """Parity with mlx_whisper / OpenAI Whisper DecodingOptions."""

    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Union[str, Sequence[int]]] = None
    prefix: Optional[Union[str, Sequence[int]]] = None
    suppress_tokens: Optional[Union[str, Sequence[int]]] = "-1"
    suppress_blank: bool = True
    suppress_numerals: bool = False
    kv_quant: bool = False  # int8 cross-KV cache (halves decode HBM reads)
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0
    fp16: bool = True


@dataclass
class DecodingResult:
    audio_features: Optional[jnp.ndarray]
    language: str
    language_probs: Optional[dict] = None
    tokens: List[int] = dataclasses.field(default_factory=list)
    text: str = ""
    avg_logprob: float = np.nan
    no_speech_prob: float = np.nan
    temperature: float = np.nan
    compression_ratio: float = np.nan


@dataclass(frozen=True)
class _StaticConfig:
    """Hashable static decode configuration (jit cache key)."""

    n_head: int
    n_text_ctx: int
    eot: int
    sot_index: int
    no_speech_token: int
    timestamp_begin: int
    no_timestamps: int
    sample_len: int
    max_initial_timestamp_index: Optional[int]
    suppress_blank: bool
    blank_tokens: Tuple[int, ...]
    suppress: Tuple[int, ...]
    without_timestamps: bool
    greedy: bool
    kv_quant: bool = False
    n_head_audio: int = 0  # encoder heads (used by in-jit encoder callers)
    # when True, _decode_jit's audio input is PRE-ENCODED features (the
    # auto-language path encodes once and shares with detection)
    audio_is_features: bool = False


def _apply_filters(logits, state, cfg: _StaticConfig):
    logits = logits.astype(jnp.float32)
    if cfg.suppress_blank:
        # upstream SuppressBlank masks blank openings AND EOT at the first
        # sampled step — but only when the filter is enabled; with
        # suppress_blank=False the model may emit EOT immediately
        logits = F.suppress_blank(logits, state, cfg.blank_tokens, cfg.eot)
    logits = F.suppress_tokens(logits, cfg.suppress)
    if not cfg.without_timestamps:
        logits = F.apply_timestamp_rules(
            logits,
            state,
            timestamp_begin=cfg.timestamp_begin,
            eot=cfg.eot,
            no_timestamps=cfg.no_timestamps,
            max_initial_timestamp_index=cfg.max_initial_timestamp_index,
        )
    return logits


@functools.partial(
    jax.jit,
    static_argnames=("cfg",),
    donate_argnames=(),
)
def _decode_jit(params, mel, initial_tokens, rng, temperature, cfg: _StaticConfig):
    """Full batched decode. Returns (tokens [B, sample_len], lengths [B],
    sum_logprobs [B], no_speech_probs [B])."""
    b = mel.shape[0]
    n_init = initial_tokens.shape[1]

    if cfg.audio_is_features:
        audio_features = mel  # pre-encoded [B, 1500, D]
    else:
        audio_features = encoder_forward(
            params, mel, cfg.n_head_audio or cfg.n_head
        )
    cross_k, cross_v = precompute_cross_kv(params, audio_features, cfg.n_head)
    if cfg.kv_quant:
        from whisperx_tpu.models.whisper.model import quantize_kv

        cross_k = tuple(quantize_kv(x) for x in cross_k)
        cross_v = tuple(quantize_kv(x) for x in cross_v)
    self_k, self_v = init_kv_cache_like(params, b, cfg, n_init=n_init)
    cache = KVCache(self_k, self_v, cross_k, cross_v)

    logits, cache, _ = decoder_forward(
        params, initial_tokens, cache, jnp.int32(0), cfg.n_head
    )
    probs_at_sot = jax.nn.softmax(logits[:, cfg.sot_index].astype(jnp.float32), -1)
    no_speech_probs = probs_at_sot[:, cfg.no_speech_token]
    last_logits = logits[:, -1]

    state = F.init_filter_state(initial_tokens)
    tokens_buf = jnp.full((b, cfg.sample_len), cfg.eot, jnp.int32)
    finished = jnp.zeros((b,), bool)
    sum_logprobs = jnp.zeros((b,), jnp.float32)
    n_sampled = jnp.int32(0)

    def cond(carry):
        _, _, finished, _, n_sampled, *_ = carry
        return (~jnp.all(finished)) & (n_sampled < cfg.sample_len)

    def body(carry):
        tokens_buf, last_logits, finished, sum_logprobs, n_sampled, state, cache, rng = carry
        logits = _apply_filters(last_logits, state, cfg)
        if cfg.greedy:
            sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        else:
            rng, sub = jax.random.split(rng)
            sampled = jax.random.categorical(sub, logits / temperature).astype(
                jnp.int32
            )
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        step_lp = jnp.take_along_axis(logprobs, sampled[:, None], axis=-1)[:, 0]
        sum_logprobs = sum_logprobs + jnp.where(finished, 0.0, step_lp)
        sampled = jnp.where(finished, cfg.eot, sampled)
        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, sampled[:, None], (0, n_sampled)
        )
        finished = finished | (sampled == cfg.eot)
        state = F.update_filter_state(state, sampled, cfg.timestamp_begin)
        new_logits, cache, _ = decoder_forward(
            params, sampled[:, None], cache, n_init + n_sampled, cfg.n_head
        )
        return (
            tokens_buf,
            new_logits[:, -1],
            finished,
            sum_logprobs,
            n_sampled + 1,
            state,
            cache,
            rng,
        )

    carry = (tokens_buf, last_logits, finished, sum_logprobs, n_sampled, state, cache, rng)
    tokens_buf, _, _, sum_logprobs, n_sampled, *_ = jax.lax.while_loop(
        cond, body, carry
    )
    lengths = jnp.argmax(tokens_buf == cfg.eot, axis=-1)
    # Rows that never emitted EOT ran the full sample_len.
    hit_eot = jnp.any(tokens_buf == cfg.eot, axis=-1)
    lengths = jnp.where(hit_eot, lengths, cfg.sample_len)
    return tokens_buf, lengths, sum_logprobs, no_speech_probs, audio_features


@functools.partial(jax.jit, static_argnames=("n_head",))
def _encode_jit(params, mel, n_head):
    return encoder_forward(params, mel, n_head)


def init_kv_cache_like(params, batch, cfg: _StaticConfig, n_init: int = 0):
    """Self-attention cache sized to the actual decode budget (prefix +
    sample_len, rounded up), NOT the full n_text_ctx — every decode step
    reads the whole cache, so unused slots cost real HBM bandwidth."""
    dec = params["decoder"]
    n_layer = len(dec["blocks"])
    d = dec["tok_emb"].shape[1]
    h = cfg.n_head
    dtype = dec["tok_emb"].dtype
    budget = n_init + cfg.sample_len + 1
    cache_len = min(cfg.n_text_ctx, -(-budget // 64) * 64)
    shape = (batch, cache_len, h, d // h)
    return (
        tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
        tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
    )


@functools.partial(jax.jit, static_argnames=("n_head", "sot", "lang_tokens"))
def _detect_language_jit(params, mel, n_head, sot, lang_tokens):
    audio_features = encoder_forward(params, mel, n_head)
    return _detect_language_features_jit(
        params, audio_features, n_head, sot, lang_tokens
    )


@functools.partial(jax.jit, static_argnames=("n_head", "sot", "lang_tokens"))
def _detect_language_features_jit(params, audio_features, n_head, sot, lang_tokens):
    b = audio_features.shape[0]
    cross_k, cross_v = precompute_cross_kv(params, audio_features, n_head)
    n_layer = len(cross_k)
    d = params["decoder"]["tok_emb"].shape[1]
    dtype = params["decoder"]["tok_emb"].dtype
    # one-token forward: an 8-slot self cache suffices (the causal mask is
    # positional), instead of zero-allocating the full n_text_ctx cache
    shape = (b, 8, n_head, d // n_head)
    cache = KVCache(
        tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
        tuple(jnp.zeros(shape, dtype) for _ in range(n_layer)),
        cross_k,
        cross_v,
    )
    tokens = jnp.full((b, 1), sot, jnp.int32)
    logits, _, _ = decoder_forward(params, tokens, cache, jnp.int32(0), n_head)
    logits = logits[:, 0].astype(jnp.float32)
    mask = jnp.full((logits.shape[-1],), -jnp.inf)
    mask = mask.at[jnp.asarray(lang_tokens)].set(0.0)
    return jax.nn.softmax(logits + mask, axis=-1)


def detect_language(
    model, mel: jnp.ndarray, tokenizer, *, features=None
) -> Tuple[list, list]:
    """Language id per batch row: returns (codes, prob dicts).

    Parity: mlx_whisper DecodingTask._detect_language (SURVEY.md §2.9).
    ``features``: pre-encoded audio features to reuse (skips the encoder).
    """
    lang_tokens = tuple(tokenizer.all_language_tokens)
    if features is not None:
        probs = _detect_language_features_jit(
            model.params, features, model.dims.n_audio_head, tokenizer.sot,
            lang_tokens,
        )
    else:
        if mel.ndim == 2:
            mel = mel[None]
        probs = _detect_language_jit(
            model.params, mel, model.dims.n_audio_head, tokenizer.sot,
            lang_tokens,
        )
    probs = np.asarray(probs)
    codes, prob_dicts = [], []
    for row in probs:
        best = int(row.argmax())
        codes.append(tokenizer.language_code_of(best))
        prob_dicts.append(
            {
                tokenizer.language_code_of(t): float(row[t])
                for t in lang_tokens
            }
        )
    return codes, prob_dicts


def _build_initial_tokens(
    tokenizer,
    options: DecodingOptions,
    n_text_ctx: int = 448,
    sample_len: Optional[int] = None,
) -> List[int]:
    tokens = list(tokenizer.sot_sequence)
    if options.without_timestamps:
        tokens = list(tokenizer.sot_sequence_including_notimestamps)
    if options.prefix is not None:
        prefix = (
            tokenizer.encode(" " + options.prefix.strip())
            if isinstance(options.prefix, str)
            else list(options.prefix)
        )
        # upstream whisper trims the prefix to n_ctx//2 - sample_len; we
        # additionally never keep more than half the context, so a huge
        # prefix can't drive the decode's sample budget to zero
        max_prefix = n_text_ctx // 2 - (sample_len or 0)
        if max_prefix <= 0:
            max_prefix = n_text_ctx // 2
        if len(prefix) > max_prefix:
            prefix = prefix[-max_prefix:]
        tokens = tokens + prefix
    if options.prompt is not None:
        prompt = (
            tokenizer.encode(" " + options.prompt.strip())
            if isinstance(options.prompt, str)
            else list(options.prompt)
        )
        n_ctx_half = n_text_ctx // 2 - 1
        tokens = [tokenizer.sot_prev] + prompt[-n_ctx_half:] + tokens
    return tokens


def decode(
    model,
    mel: jnp.ndarray,
    options: DecodingOptions = DecodingOptions(),
    *,
    tokenizer=None,
    rng: Optional[jax.Array] = None,
    keep_audio_features: bool = False,
) -> Union[DecodingResult, List[DecodingResult]]:
    """Decode 30 s mel segment(s). ``mel``: [T, n_mels] or [B, T, n_mels].

    API parity with ``mlx_whisper.decoding.decode`` as used at reference
    backends/mlx_lightning.py:187-196, generalized to true batching.
    """
    return decode_finalize(
        decode_dispatch(
            model,
            mel,
            options,
            tokenizer=tokenizer,
            rng=rng,
            keep_audio_features=keep_audio_features,
        )
    )


def decode_dispatch(
    model,
    mel: jnp.ndarray,
    options: DecodingOptions = DecodingOptions(),
    *,
    tokenizer=None,
    rng: Optional[jax.Array] = None,
    keep_audio_features: bool = False,
) -> dict:
    """Launch the jitted decode and return device handles WITHOUT
    materializing results. ``decode_finalize`` converts. Splitting the two
    lets callers dispatch the next batch while the device still executes
    this one — each host round-trip through the device tunnel costs tens
    of ms, and blocking conversion between batches serializes them.
    """
    single = mel.ndim == 2
    if single:
        mel = mel[None]
    b = mel.shape[0]

    if tokenizer is None:
        from whisperx_tpu.decoding.tokenizer import get_tokenizer

        tokenizer = get_tokenizer(
            model.is_multilingual,
            num_languages=model.dims.num_languages,
            language=options.language or "en",
            task=options.task,
        )

    language = options.language
    language_probs = [None] * b
    shared_features = None
    if model.is_multilingual and language is None:
        # encode ONCE and share the features between detection and the
        # decode program (upstream computes audio_features once too)
        shared_features = _encode_jit(
            model.params, mel.astype(model.dtype), model.dims.n_audio_head
        )
        codes, probs = detect_language(
            model, mel, tokenizer, features=shared_features
        )
        # A single language per batch (whisper semantics: per-segment
        # language comes from the SOT sequence; take the majority).
        language = max(set(codes), key=codes.count)
        language_probs = probs
        # replace() re-runs __post_init__, rebuilding the SOT sequence
        tokenizer = dataclasses.replace(tokenizer, language=language)
    language = language or "en"

    n_ctx = model.dims.n_text_ctx
    sample_len = options.sample_len or n_ctx // 2
    initial = _build_initial_tokens(
        tokenizer, options, n_text_ctx=n_ctx, sample_len=options.sample_len
    )
    if len(initial) >= n_ctx:
        raise ValueError(
            f"prompt+prefix occupy {len(initial)} of {n_ctx} context slots; "
            "no room left to generate"
        )
    initial_arr = jnp.tile(jnp.asarray(initial, jnp.int32)[None], (b, 1))
    sot_index = initial.index(tokenizer.sot)
    precision = 0.02
    max_initial_ts_index = None
    if options.max_initial_timestamp is not None:
        max_initial_ts_index = round(options.max_initial_timestamp / precision)

    blank = tuple(tokenizer.encode(" "))
    cfg = _StaticConfig(
        n_head=model.dims.n_text_head,
        n_head_audio=model.dims.n_audio_head,
        n_text_ctx=n_ctx,
        eot=tokenizer.eot,
        sot_index=sot_index,
        no_speech_token=tokenizer.no_speech,
        timestamp_begin=tokenizer.timestamp_begin,
        no_timestamps=tokenizer.no_timestamps,
        sample_len=min(sample_len, n_ctx - len(initial)),
        max_initial_timestamp_index=max_initial_ts_index,
        suppress_blank=options.suppress_blank,
        blank_tokens=blank if options.suppress_blank else (),
        suppress=F.build_suppress_list(
            tokenizer,
            options.suppress_tokens,
            suppress_numerals=options.suppress_numerals,
        ),
        without_timestamps=options.without_timestamps,
        greedy=options.temperature == 0,
        kv_quant=options.kv_quant
        or os.environ.get("WHISPERX_TPU_KV_QUANT") == "int8",
        audio_is_features=shared_features is not None,
    )

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def _shard_data(x):
        """Place a batch-leading array over the active mesh's data axis, so
        the production decode program (this exact jit) runs data-parallel
        when a mesh is installed (parallel.use_mesh / data_parallel mode).
        No-op without a mesh or when the batch doesn't divide the axis."""
        from whisperx_tpu.parallel.sharding import DATA_AXIS, get_mesh

        mesh = get_mesh()
        if mesh is None or x.shape[0] % mesh.shape[DATA_AXIS] != 0:
            return x
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    # the decode program's audio input: raw mels, or the features already
    # encoded for language detection (skips the second encoder pass)
    audio_in = (
        shared_features if shared_features is not None
        else mel.astype(model.dtype)
    )

    use_beam = options.beam_size is not None and options.temperature == 0
    if use_beam:
        from whisperx_tpu.decoding.beam import _beam_decode_jit

        k = int(options.beam_size)
        # upstream: patience multiplies how many finished sequences are
        # collected before the search stops (patience=1 → beam_size)
        max_candidates = max(k, round(k * (options.patience or 1.0)))
        beam_device = _beam_decode_jit(
            model.params,
            _shard_data(audio_in),
            _shard_data(initial_arr),
            cfg,
            k,
            max_candidates,
        )
        # dispatch-only, like the greedy path: materialization happens in
        # decode_finalize so the two-phase pipeline (queue every group,
        # then block once) holds for beam search too
        return {
            "beam_device": beam_device,
            "b": b,
            "single": single,
            "tokenizer": tokenizer,
            "language": language,
            "language_probs": language_probs,
            "options": options,
            "keep_audio_features": keep_audio_features,
        }

    # best_of: at temperature > 0, sample n independent candidates per mel
    # row (upstream GreedyDecoder n_group semantics) and keep the one with
    # the highest avg_logprob. Implemented by tiling the batch — each tiled
    # row draws its own categorical sample, so candidates are independent.
    n_cand = 1
    if options.temperature > 0 and options.best_of and int(options.best_of) > 1:
        n_cand = int(options.best_of)
    audio_in = audio_in if n_cand == 1 else jnp.repeat(audio_in, n_cand, axis=0)
    init_in = (
        initial_arr
        if n_cand == 1
        else jnp.tile(jnp.asarray(initial, jnp.int32)[None], (b * n_cand, 1))
    )

    tokens_buf, lengths, sum_logprobs, no_speech_probs, audio_features = _decode_jit(
        model.params,
        _shard_data(audio_in),
        _shard_data(init_in),
        rng,
        jnp.float32(max(options.temperature, 1e-6)),
        cfg,
    )
    return {
        "device": (tokens_buf, lengths, sum_logprobs, no_speech_probs, audio_features),
        "b": b,
        "n_cand": n_cand,
        "single": single,
        "tokenizer": tokenizer,
        "language": language,
        "language_probs": language_probs,
        "options": options,
        "keep_audio_features": keep_audio_features,
    }


def _finalize_beam(handle: dict) -> Union[DecodingResult, List[DecodingResult]]:
    from whisperx_tpu.decoding.beam import rank_beams

    (bank_toks, bank_lens, bank_scores, bank_count, live_toks, live_scores,
     n_sampled, no_speech_probs, audio_features) = handle["beam_device"]
    b = handle["b"]
    tokenizer = handle["tokenizer"]
    options = handle["options"]
    keep_audio_features = handle["keep_audio_features"]
    bank_toks = np.asarray(bank_toks)
    bank_lens = np.asarray(bank_lens)
    bank_scores = np.asarray(bank_scores)
    bank_count = np.asarray(bank_count)
    live_toks = np.asarray(live_toks)
    live_scores = np.asarray(live_scores)
    n_sampled = int(np.asarray(n_sampled))
    nsp = np.asarray(no_speech_probs)
    k = live_toks.shape[1]
    results = []
    for i in range(b):
        # upstream finalize: the banked finished sequences; rows that
        # banked fewer than beam_size pad from the in-flight beams
        n_bank = int(bank_count[i])
        toks_list = [bank_toks[i, s] for s in range(n_bank)]
        lens_list = [int(bank_lens[i, s]) for s in range(n_bank)]
        scores_list = [float(bank_scores[i, s]) for s in range(n_bank)]
        if n_bank < k:
            for j in np.argsort(-live_scores[i]):
                if len(toks_list) >= k:
                    break
                toks_list.append(live_toks[i, j])
                lens_list.append(n_sampled)
                scores_list.append(float(live_scores[i, j]))
        cand_toks = np.stack(toks_list)
        cand_lens = np.asarray(lens_list)
        cand_scores = np.asarray(scores_list)
        best, avg_lp = rank_beams(
            cand_toks, cand_lens, cand_scores, options.length_penalty
        )
        toks = cand_toks[best, : cand_lens[best]].tolist()
        text = tokenizer.decode(toks).strip()
        results.append(
            DecodingResult(
                audio_features=(
                    audio_features[i] if keep_audio_features else None
                ),
                language=handle["language"],
                language_probs=handle["language_probs"][i],
                tokens=toks,
                text=text,
                avg_logprob=avg_lp,
                no_speech_prob=float(nsp[i]),
                temperature=0.0,
                compression_ratio=compression_ratio(text) if text else np.nan,
            )
        )
    return results[0] if handle["single"] else results


def decode_finalize(handle: dict) -> Union[DecodingResult, List[DecodingResult]]:
    """Materialize the results of a ``decode_dispatch`` call (blocks on the
    device)."""
    if "done" in handle:
        return handle["done"]
    if "beam_device" in handle:
        return _finalize_beam(handle)
    tokens_buf, lengths, sum_logprobs, no_speech_probs, audio_features = handle[
        "device"
    ]
    b = handle["b"]
    n_cand = handle["n_cand"]
    single = handle["single"]
    tokenizer = handle["tokenizer"]
    language = handle["language"]
    language_probs = handle["language_probs"]
    options = handle["options"]
    keep_audio_features = handle["keep_audio_features"]

    tokens_np = np.asarray(tokens_buf)
    lengths_np = np.asarray(lengths)
    sum_lp = np.asarray(sum_logprobs)
    nsp = np.asarray(no_speech_probs)

    if n_cand > 1:
        # upstream MaximumLikelihoodRanker: candidates score by
        # sum_logprob / penalty, with penalty = ((5+len)/6)**length_penalty
        # when a length penalty is set, plain length normalization otherwise
        lp = options.length_penalty
        if lp is not None:
            penalty = ((5.0 + lengths_np) / 6.0) ** lp
        else:
            penalty = lengths_np + 1
        pick = (sum_lp / penalty).reshape(b, n_cand).argmax(axis=-1)
        sel = np.arange(b) * n_cand + pick
        tokens_np, lengths_np = tokens_np[sel], lengths_np[sel]
        sum_lp, nsp = sum_lp[sel], nsp[sel]
        if keep_audio_features:
            audio_features = audio_features[sel]

    results = []
    for i in range(b):
        toks = tokens_np[i, : lengths_np[i]].tolist()
        text = tokenizer.decode(toks).strip()
        avg_lp = float(sum_lp[i] / (lengths_np[i] + 1))
        results.append(
            DecodingResult(
                # per-row slicing dispatches a device op each — only pay
                # for it when the caller wants the features
                audio_features=audio_features[i] if keep_audio_features else None,
                language=language,
                language_probs=language_probs[i],
                tokens=toks,
                text=text,
                avg_logprob=avg_lp,
                no_speech_prob=float(nsp[i]),
                temperature=options.temperature,
                compression_ratio=compression_ratio(text) if text else np.nan,
            )
        )
    return results[0] if single else results
