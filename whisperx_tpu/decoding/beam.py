"""Batched beam-search decoding for Whisper on TPU.

The reference's MLX stack never implemented beam search (its beam_size
option was silently dropped; SURVEY.md §7 build plan calls for the real
thing). This is a jitted, fully-batched beam decode with upstream
whisper's BeamSearchDecoder semantics:

  state per (batch, beam): token buffer, cumulative logprob, filter state,
  KV cache rows. Each step: logits → filter chain → top-2K over K·V per
  batch; EOT candidates ranked above the K-th surviving continuation are
  BANKED (finished-sequence pool of ``max_candidates = round(K·patience)``
  slots, best-first — EOTs below that cut are dropped, matching upstream's
  "stop once beam_size saved" iteration) and the K best non-EOT candidates
  continue as the live beams (KV cache gathered along its batch axis). The loop ends when every batch row's bank is full.
  Final ranking applies the standard length penalty ((5+L)/6)^α, or
  score/L when α is None, over the banked sequences (live beams fill in
  when a row banked fewer than K).

  Deviation from upstream: candidates come from the global top-2K of the
  merged K·V scores rather than the union of per-beam top-(K+1) — the
  outcomes coincide except when one beam's (K+2)-th continuation outranks
  every other beam, where the global pool is score-superior.
"""

from __future__ import annotations

import functools
from typing import Tuple

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

NEG_INF = float("-inf")


def _bank_writes(
    is_eot: jnp.ndarray,  # [B, M] EOT flag per descending-score candidate
    bank_count: jnp.ndarray,  # [B] finished sequences banked so far
    k: int,  # beam width
    c: int,  # bank capacity (round(K·patience))
):
    """Which candidates get banked this step, and into which slot.

    Upstream BeamSearchDecoder iterates candidates in descending score and
    stops recording once beam_size continuations are saved ("if saved ==
    self.beam_size: break"), so an EOT ranked below the K-th surviving
    continuation is never banked — without that cut, K low-scoring EOTs in
    one step could fill the bank and terminate the search while strictly
    better live beams are still exploring. Returns (write [B, M] mask,
    slot [B, M] — dropped writes routed to the dummy slot ``c``).
    """
    non_eot_before = jnp.cumsum(~is_eot, axis=-1) - (~is_eot)  # exclusive
    bankable = is_eot & (non_eot_before < k)
    eot_rank = jnp.cumsum(bankable, axis=-1) - 1  # dense rank among bankable
    slot = bank_count[:, None] + eot_rank
    write = bankable & (slot < c)
    return write, jnp.where(write, slot, c)


def _gather_beams(tree, src_beam: jnp.ndarray, b: int, k: int):
    """Reorder a pytree whose leaves have leading (flattened) dim B*K by
    per-batch source-beam indices [B, K]. Beam-invariant state (cross-KV)
    must NOT be passed here — gathering it would copy gigabytes per step."""
    flat_idx = (jnp.arange(b)[:, None] * k + src_beam).reshape(-1)  # [B*K]

    def gather(x):
        if x.ndim == 0 or x.shape[0] != b * k:
            return x
        return x[flat_idx]

    return jax.tree.map(gather, tree)


@functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "max_candidates")
)
def _beam_decode_jit(
    params, mel, initial_tokens, cfg, beam_size: int,
    max_candidates: int = 0,
):
    """Returns (bank_tokens [B, C, L], bank_lengths [B, C],
    bank_scores [B, C], bank_count [B], live_tokens [B, K, L],
    live_scores [B, K], n_sampled, no_speech_probs [B], audio_features).

    ``max_candidates`` (C) = round(beam_size * patience); 0 → beam_size.
    """
    from whisperx_tpu.decoding.decode import _apply_filters, init_kv_cache_like

    b = mel.shape[0]
    k = beam_size
    bk = b * k
    n_init = initial_tokens.shape[1]

    if getattr(cfg, "audio_is_features", False):
        audio_features = mel  # pre-encoded (shared with language detection)
    else:
        # encoder heads, not decoder heads (equal for all stock whisper
        # configs, but truncated/custom dims can differ)
        audio_features = encoder_forward(
            params, mel, cfg.n_head_audio or cfg.n_head
        )
    cross_k, cross_v = precompute_cross_kv(params, audio_features, cfg.n_head)
    if getattr(cfg, "kv_quant", False):
        # same int8 cross-KV option as _decode_jit — beam search multiplies
        # query pressure, not K/V reads (they stay untiled below), but the
        # HBM-capacity relief must not silently vanish on the beam path
        from whisperx_tpu.models.whisper.model import quantize_kv

        cross_k = tuple(quantize_kv(x) for x in cross_k)
        cross_v = tuple(quantize_kv(x) for x in cross_v)
    # cross-K/V stay UNTILED [B, 1500, H, Dh]: cross-attention is per-query
    # independent, so decoder_forward folds the K beams into the query axis
    # (beam_groups=k) and the decode step's dominant HBM read stays 1x
    # instead of Kx. Self-attention state is per-beam ([B*K, ...]).
    self_k, self_v = init_kv_cache_like(params, bk, cfg, n_init=n_init)
    cache = KVCache(self_k, self_v, cross_k, cross_v)

    init_bk = jnp.repeat(initial_tokens, k, axis=0)  # same prefix everywhere
    logits, cache, _ = decoder_forward(
        params, init_bk, cache, jnp.int32(0), cfg.n_head, beam_groups=k
    )
    probs_at_sot = jax.nn.softmax(
        logits[::k, cfg.sot_index].astype(jnp.float32), -1
    )
    no_speech_probs = probs_at_sot[:, cfg.no_speech_token]
    last_logits = logits[:, -1]  # [B*K, V]

    state = F.init_filter_state(init_bk)
    tokens_buf = jnp.full((bk, cfg.sample_len), cfg.eot, jnp.int32)
    # only beam 0 is live initially (identical prefixes would collapse)
    scores = jnp.where(
        (jnp.arange(bk) % k) == 0, 0.0, NEG_INF
    ).astype(jnp.float32)
    n_sampled = jnp.int32(0)

    c = max_candidates or k  # finished-sequence bank slots per batch row
    # +1 dummy slot absorbs dropped scatters (bank full / non-EOT rows)
    bank_tokens = jnp.full((b, c + 1, cfg.sample_len), cfg.eot, jnp.int32)
    bank_scores = jnp.full((b, c + 1), NEG_INF, jnp.float32)
    bank_lengths = jnp.zeros((b, c + 1), jnp.int32)
    bank_count = jnp.zeros((b,), jnp.int32)

    vocab = last_logits.shape[-1]
    m = 2 * k  # candidate pool per row: at most one EOT per beam, so the
    # top-2K always contain >= K non-EOT continuations

    def cond(carry):
        n_sampled, bank_count = carry[3], carry[9]
        return (~jnp.all(bank_count >= c)) & (n_sampled < cfg.sample_len)

    def body(carry):
        (tokens_buf, last_logits, scores, n_sampled, state, cache,
         bank_tokens, bank_scores, bank_lengths, bank_count) = carry
        logits = _apply_filters(last_logits, state, cfg)  # [B*K, V]
        logprobs = jax.nn.log_softmax(logits, axis=-1)

        cand = (scores[:, None] + logprobs).reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, m)  # [B, M], desc order
        src_beam = top_idx // vocab  # [B, M]
        token = (top_idx % vocab).astype(jnp.int32)  # [B, M]
        is_eot = token == cfg.eot

        # --- bank EOT candidates (finished sequences), best-first --------
        b_idx = jnp.arange(b)[:, None]
        write, slot_c = _bank_writes(is_eot, bank_count, k, c)
        cand_tokens = tokens_buf.reshape(b, k, -1)[
            b_idx, src_beam
        ]  # [B, M, L] — source beam's sequence at EOT time
        bank_tokens = bank_tokens.at[b_idx, slot_c].set(cand_tokens)
        bank_scores = bank_scores.at[b_idx, slot_c].set(
            jnp.where(write, top_scores, NEG_INF)
        )
        bank_lengths = bank_lengths.at[b_idx, slot_c].set(
            jnp.where(write, n_sampled, 0)
        )
        bank_count = bank_count + write.sum(axis=-1)

        # --- the K best non-EOT candidates continue as live beams --------
        # stable argsort on the EOT flag keeps score order within each class
        order = jnp.argsort(is_eot.astype(jnp.int32), axis=-1, stable=True)
        sel = order[:, :k]  # [B, K] indices into the M candidates
        new_scores = jnp.take_along_axis(top_scores, sel, axis=-1)
        new_src = jnp.take_along_axis(src_beam, sel, axis=-1)
        new_tok = jnp.take_along_axis(token, sel, axis=-1)

        carry_tree = (tokens_buf, state, cache.self_k, cache.self_v)
        tokens_buf, state, g_self_k, g_self_v = _gather_beams(
            carry_tree, new_src, b, k
        )
        cache = KVCache(g_self_k, g_self_v, cache.cross_k, cache.cross_v)
        token_flat = new_tok.reshape(-1)
        scores = new_scores.reshape(-1)

        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, token_flat[:, None], (0, n_sampled)
        )
        state = F.update_filter_state(state, token_flat, cfg.timestamp_begin)

        new_logits, cache, _ = decoder_forward(
            params, token_flat[:, None], cache, n_init + n_sampled,
            cfg.n_head, beam_groups=k,
        )
        return (
            tokens_buf,
            new_logits[:, -1],
            scores,
            n_sampled + 1,
            state,
            cache,
            bank_tokens,
            bank_scores,
            bank_lengths,
            bank_count,
        )

    carry = (
        tokens_buf, last_logits, scores, n_sampled, state,
        cache, bank_tokens, bank_scores, bank_lengths, bank_count,
    )
    out = jax.lax.while_loop(cond, body, carry)
    (tokens_buf, _, scores, n_sampled, _, _,
     bank_tokens, bank_scores, bank_lengths, bank_count) = out

    return (
        bank_tokens[:, :c],
        bank_lengths[:, :c],
        bank_scores[:, :c],
        jnp.minimum(bank_count, c),
        tokens_buf.reshape(b, k, -1),
        scores.reshape(b, k),
        n_sampled,
        no_speech_probs,
        audio_features,
    )


def rank_beams(
    tokens: np.ndarray,  # [K, L]
    lengths: np.ndarray,  # [K]
    scores: np.ndarray,  # [K]
    length_penalty,
) -> Tuple[int, float]:
    """Pick the best beam; returns (beam index, avg_logprob-style score)."""
    penalties = np.empty(len(scores))
    for i, (ln, sc) in enumerate(zip(lengths, scores)):
        ln = max(int(ln), 1)
        if length_penalty is None:
            penalties[i] = sc / ln
        else:
            penalties[i] = sc / (((5.0 + ln) / 6.0) ** length_penalty)
    best = int(np.argmax(penalties))
    return best, float(scores[best] / (int(lengths[best]) + 1))
