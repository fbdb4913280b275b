"""Draft-model speculative decoding.

Role of the reference's Medusa backend (backends/mlx_medusa.py) — which was
partially aspirational (its transcribe() fell back to the base backend and
the decoder hooks were placeholders, SURVEY.md §2.3). This is a functional
speculative decoder: a small draft Whisper proposes ``gamma`` tokens
greedily, the target model verifies them in ONE batched forward, and the
longest agreeing prefix is accepted — with greedy verification the output
is token-identical to plain greedy decoding of the target model, just
cheaper per accepted token (the target's per-token weight reads amortize
over accepted runs).

Both models must share a tokenizer/vocab (e.g. large-v3 + distil-large-v3).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.decoding import filters as F
from whisperx_tpu.decoding.decode import (
    DecodingOptions,
    DecodingResult,
    _StaticConfig,
    _apply_filters,
    _build_initial_tokens,
    init_kv_cache_like,
)
from whisperx_tpu.models.whisper.model import (
    KVCache,
    decoder_forward,
    encoder_forward,
    precompute_cross_kv,
)
from whisperx_tpu.utils.text import compression_ratio


@dataclass
class SpecStats:
    proposed: int = 0
    accepted: int = 0
    target_steps: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.proposed if self.proposed else 0.0


@functools.partial(jax.jit, static_argnames=("n_head",))
def _prefill(params, tokens, cache_self, cross_kv, n_head):
    cache = KVCache(cache_self[0], cache_self[1], cross_kv[0], cross_kv[1])
    logits, cache, _ = decoder_forward(params, tokens, cache, jnp.int32(0), n_head)
    return logits, (cache.self_k, cache.self_v)


@functools.partial(jax.jit, static_argnames=("n_head",))
def _step(params, tokens, cache_self, cross_kv, offset, n_head):
    cache = KVCache(cache_self[0], cache_self[1], cross_kv[0], cross_kv[1])
    logits, cache, _ = decoder_forward(params, tokens, cache, offset, n_head)
    return logits, (cache.self_k, cache.self_v)


class SpeculativeDecoder:
    def __init__(self, target_model, draft_model, gamma: int = 4):
        assert target_model.dims.n_vocab == draft_model.dims.n_vocab, (
            "target and draft must share a vocabulary"
        )
        self.target = target_model
        self.draft = draft_model
        self.gamma = gamma
        self.stats = SpecStats()

    def decode(
        self,
        mel: jnp.ndarray,  # [T, n_mels]
        options: DecodingOptions = DecodingOptions(),
        tokenizer=None,
    ) -> DecodingResult:
        if tokenizer is None:
            from whisperx_tpu.decoding.tokenizer import get_tokenizer

            tokenizer = get_tokenizer(
                self.target.is_multilingual,
                num_languages=self.target.num_languages,
                language=options.language or "en",
                task=options.task,
                vocab_path=self.target.vocab_path,
            )

        initial = _build_initial_tokens(tokenizer, options)
        n_init = len(initial)
        sample_len = options.sample_len or self.target.dims.n_text_ctx // 2
        cfg = _StaticConfig(
            n_head=self.target.dims.n_text_head,
            n_text_ctx=self.target.dims.n_text_ctx,
            eot=tokenizer.eot,
            sot_index=initial.index(tokenizer.sot),
            no_speech_token=tokenizer.no_speech,
            timestamp_begin=tokenizer.timestamp_begin,
            no_timestamps=tokenizer.no_timestamps,
            sample_len=min(sample_len, self.target.dims.n_text_ctx - n_init),
            max_initial_timestamp_index=(
                round(options.max_initial_timestamp / 0.02)
                if options.max_initial_timestamp is not None
                else None
            ),
            blank_tokens=tuple(tokenizer.encode(" "))
            if options.suppress_blank
            else (),
            suppress=F.build_suppress_list(tokenizer, options.suppress_tokens),
            without_timestamps=options.without_timestamps,
            greedy=True,
        )
        d_cfg = _StaticConfig(
            **{**cfg.__dict__, "n_head": self.draft.dims.n_text_head,
               "n_text_ctx": self.draft.dims.n_text_ctx},
        )

        mel_b = mel[None]
        t_feats = encoder_forward(
            self.target.params, mel_b.astype(self.target.dtype), self.target.dims.n_audio_head
        )
        d_feats = encoder_forward(
            self.draft.params, mel_b.astype(self.draft.dtype), self.draft.dims.n_audio_head
        )
        t_cross = precompute_cross_kv(self.target.params, t_feats, cfg.n_head)
        d_cross = precompute_cross_kv(self.draft.params, d_feats, d_cfg.n_head)
        t_self = init_kv_cache_like(self.target.params, 1, cfg, n_init=n_init)
        d_self = init_kv_cache_like(self.draft.params, 1, d_cfg, n_init=n_init)

        init_arr = jnp.asarray(initial, jnp.int32)[None]
        t_logits, t_self = _prefill(
            self.target.params, init_arr, t_self, t_cross, cfg.n_head
        )
        d_logits, d_self = _prefill(
            self.draft.params, init_arr, d_self, d_cross, d_cfg.n_head
        )
        no_speech_prob = float(
            jax.nn.softmax(t_logits[0, cfg.sot_index].astype(jnp.float32))[
                cfg.no_speech_token
            ]
        )

        tokens: list[int] = []
        sum_logprob = 0.0
        state = F.init_filter_state(init_arr)
        last_target_logits = t_logits[:, -1]

        while len(tokens) < cfg.sample_len:
            # --- draft proposes gamma tokens -----------------------------
            draft_tokens = []
            d_state = state
            d_last = d_logits[:, -1] if not tokens else self._d_last
            cur = len(tokens)
            for g in range(self.gamma):
                if cur + g >= cfg.sample_len:
                    break
                fl = _apply_filters(d_last, d_state, d_cfg)
                tok = int(jnp.argmax(fl[0]))
                draft_tokens.append(tok)
                d_state = F.update_filter_state(
                    d_state, jnp.asarray([tok]), cfg.timestamp_begin
                )
                if tok == cfg.eot:
                    break
                d_last, d_self = _step(
                    self.draft.params,
                    jnp.asarray([[tok]], jnp.int32),
                    d_self,
                    d_cross,
                    jnp.int32(n_init + cur + g),
                    d_cfg.n_head,
                )
                d_last = d_last[:, -1]
            if not draft_tokens:
                break
            self.stats.proposed += len(draft_tokens)

            # --- target verifies the whole run in one forward ------------
            verify_in = jnp.asarray([draft_tokens], jnp.int32)
            v_logits, t_self_new = _step(
                self.target.params,
                verify_in,
                t_self,
                t_cross,
                jnp.int32(n_init + len(tokens)),
                cfg.n_head,
            )
            self.stats.target_steps += 1

            # target's choice at position j is computed from logits at j-1;
            # position 0 uses last_target_logits
            accepted = 0
            v_state = state
            stream = jnp.concatenate(
                [last_target_logits[:, None], v_logits], axis=1
            )  # [1, γ+1, V]
            for j, proposed in enumerate(draft_tokens):
                fl = _apply_filters(stream[:, j], v_state, cfg)
                t_choice = int(jnp.argmax(fl[0]))
                lp = float(jax.nn.log_softmax(fl[0])[t_choice])
                tokens.append(t_choice)
                sum_logprob += lp
                v_state = F.update_filter_state(
                    v_state, jnp.asarray([t_choice]), cfg.timestamp_begin
                )
                if t_choice != proposed or t_choice == cfg.eot:
                    accepted += int(t_choice == proposed)
                    break
                accepted += 1
            self.stats.accepted += accepted
            state = v_state

            if tokens and tokens[-1] == cfg.eot:
                tokens.pop()
                break

            # cache consistency: the verify pass wrote K/V for every DRAFT
            # token; positions at/after a mismatch hold wrong entries, but
            # masked attention never reads past the decode offset, and the
            # fix-up steps below overwrite the mismatch position itself.
            t_self = t_self_new

            # draft catches up on the accepted tail (also repairs its cache
            # at the mismatch position)
            self._d_last, d_self = _step(
                self.draft.params,
                jnp.asarray([[tokens[-1]]], jnp.int32),
                d_self,
                d_cross,
                jnp.int32(n_init + len(tokens) - 1),
                d_cfg.n_head,
            )
            self._d_last = self._d_last[:, -1]

            if accepted == len(draft_tokens) and tokens[-1] == draft_tokens[-1]:
                # full acceptance: verify logits already give the next step
                last_target_logits = v_logits[:, accepted - 1]
            else:
                # mismatch: re-run the target on its own choice to repair
                # the cache slot and obtain next-token logits
                last_target_logits, t_self = _step(
                    self.target.params,
                    jnp.asarray([[tokens[-1]]], jnp.int32),
                    t_self,
                    t_cross,
                    jnp.int32(n_init + len(tokens) - 1),
                    cfg.n_head,
                )
                last_target_logits = last_target_logits[:, -1]

        text = tokenizer.decode(tokens).strip()
        return DecodingResult(
            audio_features=t_feats[0],
            language=options.language or "en",
            tokens=tokens,
            text=text,
            avg_logprob=sum_logprob / (len(tokens) + 1),
            no_speech_prob=no_speech_prob,
            temperature=0.0,
            compression_ratio=compression_ratio(text) if text else float("nan"),
        )
