"""Batched beam-search decoding for Whisper on TPU.

The reference's MLX stack never implemented beam search (its beam_size
option was silently dropped; SURVEY.md §7 build plan calls for the real
thing). This is a jitted, fully-batched beam decode:

  state per (batch, beam): token buffer, cumulative logprob, filter state,
  KV cache rows. Each step: logits → filter chain → top-k over K·V per
  batch → gather beams (KV cache reordered along its batch axis) → frozen
  EOT beams propose only EOT at zero cost. Final ranking applies the
  standard length penalty ((5+L)/6)^α, or score/L when α is None.
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


@functools.partial(jax.jit, static_argnames=("cfg", "beam_size"))
def _beam_decode_jit(params, mel, initial_tokens, cfg, beam_size: int):
    """Returns (tokens [B, K, sample_len], lengths [B, K], scores [B, K],
    no_speech_probs [B])."""
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
    # tile along batch for beams: per-layer [B, T, H, D] -> [B*K, T, H, D].
    # KNOWN COST: cross-K/V are identical across beams, so this multiplies
    # the decode step's dominant HBM read by K; folding beams into the
    # query axis (attend [B,K,H,Dh] queries against untiled [B,T,H,Dh]
    # K/V) would remove it but needs a grouped cross-attention variant in
    # the model — tracked in ROADMAP (beam is a non-default path).
    cross_k = tuple(jnp.repeat(x, k, axis=0) for x in cross_k)
    cross_v = tuple(jnp.repeat(x, k, axis=0) for x in cross_v)
    self_k, self_v = init_kv_cache_like(params, bk, cfg, n_init=n_init)
    cache = KVCache(self_k, self_v, cross_k, cross_v)

    init_bk = jnp.repeat(initial_tokens, k, axis=0)  # same prefix everywhere
    logits, cache, _ = decoder_forward(
        params, init_bk, cache, jnp.int32(0), cfg.n_head
    )
    probs_at_sot = jax.nn.softmax(
        logits[::k, cfg.sot_index].astype(jnp.float32), -1
    )
    no_speech_probs = probs_at_sot[:, cfg.no_speech_token]
    last_logits = logits[:, -1]  # [B*K, V]

    state = F.init_filter_state(init_bk)
    tokens_buf = jnp.full((bk, cfg.sample_len), cfg.eot, jnp.int32)
    finished = jnp.zeros((bk,), bool)
    # only beam 0 is live initially (identical prefixes would collapse)
    scores = jnp.where(
        (jnp.arange(bk) % k) == 0, 0.0, NEG_INF
    ).astype(jnp.float32)
    n_sampled = jnp.int32(0)

    vocab = last_logits.shape[-1]

    def cond(carry):
        _, _, finished, _, n_sampled, *_ = carry
        return (~jnp.all(finished)) & (n_sampled < cfg.sample_len)

    def body(carry):
        tokens_buf, last_logits, finished, scores, n_sampled, state, cache = carry
        logits = _apply_filters(last_logits, state, cfg)  # [B*K, V]
        logprobs = jax.nn.log_softmax(logits, axis=-1)
        # frozen EOT beams: only EOT at zero incremental cost
        eot_row = jnp.full((vocab,), NEG_INF).at[cfg.eot].set(0.0)
        logprobs = jnp.where(finished[:, None], eot_row[None, :], logprobs)

        cand = scores[:, None] + logprobs  # [B*K, V]
        cand = cand.reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(cand, k)  # [B, K]
        src_beam = top_idx // vocab  # [B, K]
        token = (top_idx % vocab).astype(jnp.int32)  # [B, K]

        carry_tree = (tokens_buf, finished, state, cache.self_k, cache.self_v)
        tokens_buf, finished, state, g_self_k, g_self_v = _gather_beams(
            carry_tree, src_beam, b, k
        )
        cache = KVCache(g_self_k, g_self_v, cache.cross_k, cache.cross_v)
        token_flat = token.reshape(-1)
        scores = top_scores.reshape(-1)

        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, token_flat[:, None], (0, n_sampled)
        )
        newly_finished = token_flat == cfg.eot
        finished = finished | newly_finished
        state = F.update_filter_state(state, token_flat, cfg.timestamp_begin)

        new_logits, cache, _ = decoder_forward(
            params, token_flat[:, None], cache, n_init + n_sampled, cfg.n_head
        )
        return (
            tokens_buf,
            new_logits[:, -1],
            finished,
            scores,
            n_sampled + 1,
            state,
            cache,
        )

    carry = (tokens_buf, last_logits, finished, scores, n_sampled, state, cache)
    tokens_buf, _, finished, scores, n_sampled, *_ = jax.lax.while_loop(
        cond, body, carry
    )

    hit_eot = jnp.any(tokens_buf == cfg.eot, axis=-1)
    lengths = jnp.where(
        hit_eot, jnp.argmax(tokens_buf == cfg.eot, axis=-1), cfg.sample_len
    )
    return (
        tokens_buf.reshape(b, k, -1),
        lengths.reshape(b, k),
        scores.reshape(b, k),
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
