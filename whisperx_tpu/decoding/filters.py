"""Batched logit filters for Whisper decoding.

Functional equivalents of the reference's ``LogitFilter`` chain —
SuppressBlank / SuppressTokens / ApplyTimestampRules (contract at
mlx_whisper_batch_decoder.py:262-303; the batch-broadcasting fix the
reference monkey-patches in mlx_ultra_optimized_batch.py:29-75 is native
here). All rules are pure ``[B, V] -> [B, V]`` maps over f32 logits driven by
a small carried ``FilterState``, so the whole chain stays inside the jitted
decode loop with static shapes.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class FilterState(NamedTuple):
    """Per-sequence token-history summary carried through the decode loop."""

    last_token: jnp.ndarray  # [B] int32
    penult_token: jnp.ndarray  # [B] int32
    last_timestamp: jnp.ndarray  # [B] int32 (token id; timestamp_begin if none)
    has_timestamp: jnp.ndarray  # [B] bool
    step: jnp.ndarray  # scalar int32: tokens sampled so far


def init_filter_state(initial_tokens: jnp.ndarray) -> FilterState:
    """``initial_tokens``: [B, n_init] — the shared SOT/prompt prefix."""
    b = initial_tokens.shape[0]
    return FilterState(
        last_token=initial_tokens[:, -1],
        penult_token=(
            initial_tokens[:, -2]
            if initial_tokens.shape[1] >= 2
            else jnp.full((b,), -1, jnp.int32)
        ),
        last_timestamp=jnp.zeros((b,), jnp.int32),
        has_timestamp=jnp.zeros((b,), bool),
        step=jnp.zeros((), jnp.int32),
    )


def update_filter_state(
    state: FilterState, sampled: jnp.ndarray, timestamp_begin: int
) -> FilterState:
    is_ts = sampled >= timestamp_begin
    return FilterState(
        last_token=sampled,
        penult_token=state.last_token,
        last_timestamp=jnp.where(is_ts, sampled, state.last_timestamp),
        has_timestamp=state.has_timestamp | is_ts,
        step=state.step + 1,
    )


def _id_mask(n_vocab: int, ids) -> jnp.ndarray:
    """Boolean vocab mask. Built from constants, so XLA hoists it out of
    the decode loop — the per-step op is then a fused select instead of a
    scatter (scatters inside the loop measured ~ms each on TPU)."""
    return jnp.zeros((n_vocab,), bool).at[jnp.asarray(ids)].set(True)


def suppress_blank(
    logits: jnp.ndarray, state: FilterState, blank_tokens: Tuple[int, ...], eot: int
) -> jnp.ndarray:
    """At the first sampled position, forbid blank/EOT openings."""
    mask = _id_mask(logits.shape[-1], list(blank_tokens) + [eot])
    return jnp.where((state.step == 0) & mask[None], NEG_INF, logits)


def suppress_tokens(logits: jnp.ndarray, token_ids: Tuple[int, ...]) -> jnp.ndarray:
    if not token_ids:
        return logits
    mask = _id_mask(logits.shape[-1], token_ids)
    return jnp.where(mask[None], NEG_INF, logits)


def apply_timestamp_rules(
    logits: jnp.ndarray,
    state: FilterState,
    *,
    timestamp_begin: int,
    eot: int,
    no_timestamps: int,
    max_initial_timestamp_index: Optional[int],
) -> jnp.ndarray:
    """Whisper's timestamp grammar, vectorized over the batch.

    Rules (per row): <|notimestamps|> never sampled; timestamps come in
    pairs (after an unpaired timestamp only a timestamp/EOT may follow;
    after a completed pair the next token must be text); timestamps are
    non-decreasing; the first sampled token must be a timestamp, capped at
    ``max_initial_timestamp``; and when the total timestamp probability
    beats every text token, text is masked out.
    """
    b, v = logits.shape
    vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
    is_ts_col = vocab_ids >= timestamp_begin  # [1, V]

    logits = logits.at[:, no_timestamps].set(NEG_INF)

    last_was_ts = (state.last_token >= timestamp_begin)[:, None]  # [B,1]
    # "Penultimate was a timestamp" counts sampled tokens only: with fewer
    # than 2 sampled, it is vacuously true (Whisper's `len(seq) < 2 or ...`),
    # so the token right after the forced initial timestamp must be text —
    # penult_token still holds a prompt/task token at that step and must not
    # be consulted.
    penult_was_ts = (
        (state.penult_token >= timestamp_begin) | (state.step < 2)
    )[:, None]
    sampled_any = (state.step > 0)

    # Pair grammar. After unpaired ts: mask text (ids < eot). After a pair:
    # mask timestamps.
    mask_text = last_was_ts & ~penult_was_ts & (vocab_ids < eot)
    mask_ts_after_pair = last_was_ts & penult_was_ts & is_ts_col
    grammar_mask = jnp.where(sampled_any, mask_text | mask_ts_after_pair, False)

    # Monotonicity: never below the latest timestamp (exclusive only while a
    # pair is open — the closing timestamp may equal the opening one).
    open_pair = (last_was_ts & ~penult_was_ts)[:, 0]
    lower = jnp.where(
        state.has_timestamp,
        jnp.where(open_pair, state.last_timestamp, state.last_timestamp + 1),
        timestamp_begin,
    )  # [B]
    mono_mask = is_ts_col & (vocab_ids < lower[:, None])

    logits = jnp.where(grammar_mask | mono_mask, NEG_INF, logits)

    # First sampled token must be a timestamp, bounded by max_initial.
    first = state.step == 0
    init_mask = ~is_ts_col  # mask everything below timestamp_begin
    if max_initial_timestamp_index is not None:
        last_allowed = timestamp_begin + max_initial_timestamp_index
        init_mask = init_mask | (vocab_ids > last_allowed)
    logits = jnp.where(first & init_mask, NEG_INF, logits)

    # Sample a timestamp whenever its total probability outweighs any
    # single text token.
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts_col, logprobs, NEG_INF), axis=-1
    )  # [B]
    max_text = jnp.max(jnp.where(is_ts_col, NEG_INF, logprobs), axis=-1)  # [B]
    force_ts = (ts_logprob > max_text)[:, None]
    logits = jnp.where(force_ts & ~is_ts_col, NEG_INF, logits)
    return logits


def numeral_tokens(tokenizer) -> Tuple[int, ...]:
    """Token ids whose text contains digits or currency symbols — the
    ``suppress_numerals`` option (reference transcribe.py asr_options;
    wav2vec2 alignment can't time numerals written as digits). Scanned once
    per tokenizer and memoized on the instance."""
    cached = getattr(tokenizer, "_numeral_tokens", None)
    if cached is None:
        bad = set("0123456789%$£€¥₹")
        out = []
        for t in range(tokenizer.eot):
            try:
                text = tokenizer.decode([t])
            except Exception:
                continue
            if any(c in bad for c in text):
                out.append(t)
        cached = tuple(out)
        tokenizer._numeral_tokens = cached
    return cached


def build_suppress_list(
    tokenizer,
    suppress_tokens_option,
    *,
    suppress_numerals: bool = False,
) -> Tuple[int, ...]:
    """Resolve the user-facing ``suppress_tokens`` option (reference
    semantics: "-1" → non-speech set; always add task/special markers)."""
    if isinstance(suppress_tokens_option, str):
        suppress = [int(t) for t in suppress_tokens_option.split(",") if t]
    elif suppress_tokens_option is None:
        suppress = []
    else:
        suppress = list(suppress_tokens_option)
    if -1 in suppress:
        suppress = [t for t in suppress if t >= 0]
        suppress.extend(tokenizer.non_speech_tokens)
    if suppress_numerals:
        suppress.extend(numeral_tokens(tokenizer))
    suppress.extend(
        [
            tokenizer.transcribe,
            tokenizer.translate,
            tokenizer.sot,
            tokenizer.sot_prev,
            tokenizer.sot_lm,
        ]
    )
    if tokenizer.no_speech is not None:
        suppress.append(tokenizer.no_speech)
    suppress.extend(tokenizer.all_language_tokens)
    return tuple(sorted(set(suppress)))
