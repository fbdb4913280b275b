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

import dataclasses
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


def _spec_loop(
    t_params, d_params, mel, init_arr, cfg, d_cfg, gamma, shared_encoder=False
):
    """The WHOLE speculative generate loop as one traced program (B=1).

    Prefill both models, then a ``lax.while_loop`` whose body:

      1. drafts γ tokens with a ``lax.scan`` whose FIRST step re-feeds the
         last accepted token — which implicitly repairs the draft cache's
         mismatch slot from the previous iteration (no conditional
         fix-up);
      2. verifies ``[last_accepted, d_1..d_γ]`` in ONE target pass — the
         leading token likewise repairs the target cache, and the final
         position's logits provide the standard BONUS token on full
         acceptance (γ+1 tokens per verify pass);
      3. accepts the longest agreeing prefix with a γ+1-step scan that
         carries the filter state.

    Every iteration runs the exact same ops — no ``lax.cond`` — because
    measured on TPU the conditional cache fix-up dominated the loop
    (~70 ms/iter of overhead vs ~8 ms for the uniform body). Greedy
    verification keeps the output token-identical to vanilla greedy
    decoding of the target.

    Returns (tokens_buf [1, sample_len], n_sampled, sum_logprob,
    no_speech_prob, proposed, accepted, target_passes).
    """
    n_init = init_arr.shape[1]
    # encoder + cross-KV INSIDE the jitted program: eagerly dispatching the
    # ~400 encoder ops through the device tunnel cost ~2 s per call
    t_feats = encoder_forward(t_params, mel, cfg.n_head_audio)
    d_feats = (
        t_feats
        if shared_encoder
        else encoder_forward(d_params, mel, d_cfg.n_head_audio)
    )
    t_cross = precompute_cross_kv(t_params, t_feats, cfg.n_head)
    d_cross = precompute_cross_kv(d_params, d_feats, d_cfg.n_head)
    # verify passes write up to γ+1 slots past the sampled count — widen
    # the self-cache budget accordingly
    pad_cfg = dataclasses.replace(cfg, sample_len=cfg.sample_len + gamma + 1)
    pad_d_cfg = dataclasses.replace(d_cfg, sample_len=d_cfg.sample_len + gamma + 1)
    t_self = init_kv_cache_like(t_params, 1, pad_cfg, n_init=n_init)
    d_self = init_kv_cache_like(d_params, 1, pad_d_cfg, n_init=n_init)

    # cross-KV is read-only: close over it instead of threading it through
    # the while/scan carries
    def t_forward(tokens, self_kv, offset):
        cache = KVCache(self_kv[0], self_kv[1], t_cross[0], t_cross[1])
        logits, cache, _ = decoder_forward(
            t_params, tokens, cache, offset, cfg.n_head
        )
        return logits, (cache.self_k, cache.self_v)

    def d_forward(tokens, self_kv, offset):
        cache = KVCache(self_kv[0], self_kv[1], d_cross[0], d_cross[1])
        logits, cache, _ = decoder_forward(
            d_params, tokens, cache, offset, d_cfg.n_head
        )
        return logits, (cache.self_k, cache.self_v)

    t_logits, t_self = t_forward(init_arr, t_self, jnp.int32(0))
    _, d_self = d_forward(init_arr[:, :-1], d_self, jnp.int32(0))
    no_speech_prob = jax.nn.softmax(
        t_logits[:, cfg.sot_index].astype(jnp.float32), -1
    )[0, cfg.no_speech_token]

    # γ+1 slack so the vectorized acceptance can write a full window
    n_vocab = t_params["decoder"]["tok_emb"].shape[0]
    sup_add = (
        jnp.zeros((n_vocab,), jnp.float32)
        .at[jnp.asarray(list(cfg.suppress), jnp.int32)]
        .set(F.NEG_INF)
        if cfg.suppress
        else jnp.zeros((n_vocab,), jnp.float32)
    )
    blank_mask = (
        jnp.zeros((n_vocab,), bool)
        .at[jnp.asarray(list(cfg.blank_tokens) + [cfg.eot])]
        .set(True)
        if cfg.blank_tokens
        else jnp.zeros((n_vocab,), bool)
    )
    tokens_buf = jnp.full((1, cfg.sample_len + gamma + 1), cfg.eot, jnp.int32)
    state0 = F.init_filter_state(init_arr)
    carry = (
        tokens_buf,
        jnp.int32(0),  # n sampled
        jnp.bool_(False),  # finished
        jnp.float32(0.0),  # sum logprob
        state0,
        t_self,
        d_self,
        init_arr[:, -1],  # last accepted token [1]
        jnp.int32(0),  # proposed
        jnp.int32(0),  # accepted
        jnp.int32(0),  # target passes
    )

    def cond(c):
        _, n, finished, *_ = c
        return (~finished) & (n < cfg.sample_len)

    def body(c):
        (buf, n, finished, sum_lp, state, t_c, d_c, last_tok, prop, acc, tp) = c
        # vmap-safety: under jax.vmap the while_loop body keeps executing
        # for rows whose cond is already false — every write below is gated
        # on `active` so finished/saturated rows are bit-frozen
        active = (~finished) & (n < cfg.sample_len)
        # slot of the last accepted token (first iteration: the final
        # prompt token — recomputing its K/V is idempotent)
        pos = n_init + n - 1

        # --- draft proposes gamma tokens; step 1 re-feeds last_tok ------
        def draft_step(dc, _):
            d_state, prev, self_kv, p = dc
            nl, self_kv = d_forward(prev[:, None], self_kv, p)
            if cfg.without_timestamps:
                # static additive suppress mask fuses into the logits add —
                # the generic filter chain's per-step scatters cost ~1 ms
                fl = nl[:, -1].astype(jnp.float32) + sup_add[None]
                fl = jnp.where(
                    (d_state.step == 0) & blank_mask[None], F.NEG_INF, fl
                )
            else:
                fl = _apply_filters(nl[:, -1], d_state, d_cfg)
            tok = jnp.argmax(fl, -1).astype(jnp.int32)  # [1]
            d_state = F.update_filter_state(d_state, tok, cfg.timestamp_begin)
            return (d_state, tok, self_kv, p + 1), tok[0]

        (_, _, d_c, _), draft_toks = jax.lax.scan(
            draft_step, (state, last_tok, d_c, pos), None, length=gamma
        )  # draft_toks: [gamma]
        # also write d_gamma's K/V into the draft cache: a full acceptance
        # (+bonus) advances past slot pos+gamma, and nothing else would
        # ever write it — later draft queries would attend a zeroed slot
        # forever, silently degrading acceptance (logits discarded)
        _, d_c = d_forward(draft_toks[None, -1:], d_c, pos + gamma)

        # --- ONE target pass: repair slot + verify + bonus logits -------
        verify_in = jnp.concatenate([last_tok[:, None], draft_toks[None]], 1)
        v_logits, t_c = t_forward(verify_in, t_c, pos)  # [1, gamma+1, V]

        # --- accept the longest agreeing prefix (+ bonus token) ---------
        # position j's target choice comes from v_logits[:, j]; j == gamma
        # is the bonus slot, whose sentinel never matches a draft
        if cfg.without_timestamps:
            # no timestamp grammar → the filter chain is position-wise
            # independent (suppress lists + first-token blank mask), so the
            # whole acceptance computes as vector math — no γ+1-step scan
            # (the scan's per-step filter ops cost ~1 ms each on TPU)
            js = jnp.arange(gamma + 1)
            fl = v_logits.astype(jnp.float32) + sup_add[None, None]
            if cfg.blank_tokens:
                first_pos = (state.step + js) == 0  # [γ+1]
                fl = jnp.where(
                    first_pos[None, :, None] & blank_mask[None, None, :],
                    F.NEG_INF,
                    fl,
                )
            choices = jnp.argmax(fl, -1).astype(jnp.int32)[0]  # [γ+1]
            lps = jnp.take_along_axis(
                jax.nn.log_softmax(fl[0], -1), choices[:, None], axis=-1
            )[:, 0]  # [γ+1]
            match = jnp.concatenate(
                [choices[:gamma] == draft_toks, jnp.zeros((1,), bool)]
            )
            is_eot = choices == cfg.eot
            # position j written iff every earlier position matched and was
            # not EOT, and the buffer slot exists
            ok = match & ~is_eot
            prior_ok = jnp.concatenate(
                [jnp.ones((1,), bool), jnp.cumprod(ok[:-1]).astype(bool)]
            )
            keep = prior_ok & (n + js < cfg.sample_len) & active
            w = keep.sum().astype(jnp.int32)
            window = jax.lax.dynamic_slice(buf, (0, n), (1, gamma + 1))
            window = jnp.where(keep[None], choices[None], window)
            buf = jax.lax.dynamic_update_slice(buf, window, (0, n))
            sum_lp = sum_lp + jnp.sum(jnp.where(keep, lps, 0.0))
            n_match = jnp.sum(keep[:gamma] & match[:gamma]).astype(jnp.int32)
            finished = finished | jnp.any(keep & is_eot)
            # rebuild the filter state after the written run (no timestamp
            # fields change in this mode)
            last_written = jnp.where(
                w >= 1, choices[jnp.maximum(w - 1, 0)], state.last_token[0]
            )
            penult_written = jnp.where(
                w >= 2,
                choices[jnp.maximum(w - 2, 0)],
                jnp.where(w >= 1, state.last_token[0], state.penult_token[0]),
            )
            state = F.FilterState(
                last_token=last_written[None],
                penult_token=penult_written[None],
                last_timestamp=state.last_timestamp,
                has_timestamp=state.has_timestamp,
                step=state.step + w,
            )
        else:
            draft_ext = jnp.concatenate(
                [draft_toks, jnp.full((1,), -1, jnp.int32)]
            )

            def acc_step(ac, j):
                v_state, writing, w, s_lp, b, fin, n_match = ac
                fl = _apply_filters(v_logits[:, j], v_state, cfg)
                choice = jnp.argmax(fl, -1).astype(jnp.int32)  # [1]
                lp = jax.nn.log_softmax(fl, -1)[0, choice[0]]
                write = writing & (n + j < cfg.sample_len)
                b = jnp.where(
                    write,
                    jax.lax.dynamic_update_slice(b, choice[:, None], (0, n + j)),
                    b,
                )
                s_lp = s_lp + jnp.where(write, lp, 0.0)
                new_state = F.update_filter_state(v_state, choice, cfg.timestamp_begin)
                v_state = jax.tree_util.tree_map(
                    lambda a, bb: jnp.where(write, bb, a), v_state, new_state
                )
                match = choice[0] == draft_ext[j]
                is_eot = choice[0] == cfg.eot
                w = w + jnp.where(write, 1, 0)
                n_match = n_match + jnp.where(write & match & (j < gamma), 1, 0)
                fin = fin | (write & is_eot)
                writing = writing & match & ~is_eot
                return (v_state, writing, w, s_lp, b, fin, n_match), None

            (state, _, w, sum_lp, buf, finished, n_match), _ = jax.lax.scan(
                acc_step,
                (state, active, jnp.int32(0), sum_lp, buf, finished, jnp.int32(0)),
                jnp.arange(gamma + 1),
            )

        new_n = n + w
        last_tok2 = jax.lax.dynamic_slice(
            buf, (0, jnp.maximum(new_n - 1, 0)), (1, 1)
        )[:, 0]
        last_tok2 = jnp.where(new_n >= 1, last_tok2, last_tok)
        return (
            buf,
            new_n,
            finished,
            sum_lp,
            state,
            t_c,
            d_c,
            last_tok2,
            prop + jnp.where(active, gamma, 0),
            acc + n_match,
            tp + jnp.where(active, 1, 0),
        )

    out = jax.lax.while_loop(cond, body, carry)
    buf, n, _, sum_lp, *_ = out
    prop, acc, tp = out[8], out[9], out[10]
    return buf, n, sum_lp, no_speech_prob, prop, acc, tp, t_feats


_spec_loop_jit = functools.partial(
    jax.jit, static_argnames=("cfg", "d_cfg", "gamma", "shared_encoder")
)(_spec_loop)


@functools.partial(
    jax.jit, static_argnames=("cfg", "d_cfg", "gamma", "shared_encoder")
)
def _spec_batch_jit(
    t_params, d_params, mels, init_arr, cfg, d_cfg, gamma, shared_encoder=False
):
    """Batched speculative decode: ``jax.vmap`` of the single-row loop over
    [B, T, n_mels] mels — rows draft/verify/accept independently (each with
    its own termination; the vmapped while_loop runs until the slowest row
    finishes, with finished rows bit-frozen by the `active` gates in the
    body). One jitted program for the whole batch; per-row output is
    token-identical to the B=1 loop."""

    def one(mel_row, init_row):
        return _spec_loop(
            t_params,
            d_params,
            mel_row[None],
            init_row[None],
            cfg,
            d_cfg,
            gamma,
            shared_encoder=shared_encoder,
        )

    return jax.vmap(one)(mels, init_arr)


def truncated_self_draft(model, n_layers: int):
    """Self-draft: the target's own first ``n_layers`` decoder blocks
    (weights shared, nothing copied). Pairs with ``zero_tail_model`` for an
    exact-agreement mechanism benchmark, and models distil-style drafts
    (reference Medusa aspiration, mlx_medusa.py:274-324) without a second
    checkpoint."""
    from whisperx_tpu.models.whisper import Whisper

    dec = dict(model.params["decoder"])
    dec["blocks"] = list(model.params["decoder"]["blocks"][:n_layers])
    params = {**model.params, "decoder": dec}
    dims = dataclasses.replace(model.dims, n_text_layer=n_layers)
    return Whisper(
        dims,
        params,
        dtype=model.dtype,
        name=f"{model.name}-draft{n_layers}",
        vocab_path=model.vocab_path,
    )


def zero_tail_model(model, keep_layers: int):
    """Zero the output projections of every decoder block past
    ``keep_layers`` — with pre-LN residual blocks those layers become exact
    identities, so ``truncated_self_draft(model, keep_layers)`` agrees with
    the full model EXACTLY while the full model still pays for reading all
    its weights. This isolates the speculative mechanism's speedup at
    acceptance = 1 (its upper bound) with random weights."""
    from whisperx_tpu.models.whisper import Whisper

    out = scaled_tail_model(model, keep_layers, 0.0)
    out.name = f"{model.name}-zerotail{keep_layers}"
    return out


def scaled_tail_model(model, keep_layers: int, alpha: float):
    """Scale (instead of zero) the output projections of decoder blocks past
    ``keep_layers`` by ``alpha``. At alpha=0 this is ``zero_tail_model``
    (draft agrees exactly, acceptance = 1); growing alpha lets the tail
    layers increasingly diverge the target from its truncated self-draft,
    dialing the acceptance rate down continuously — the instrument for the
    measured acceptance-vs-speedup curve (bench.py spec mode 'curve')."""
    from whisperx_tpu.models.whisper import Whisper

    def scaled(lin):
        out = dict(lin)
        out["w"] = lin["w"] * alpha
        if lin.get("b") is not None:
            out["b"] = lin["b"] * alpha
        return out

    blocks = []
    for i, blk in enumerate(model.params["decoder"]["blocks"]):
        if i < keep_layers:
            blocks.append(blk)
            continue
        nb = {k: v for k, v in blk.items()}
        nb["attn"] = {**blk["attn"], "out": scaled(blk["attn"]["out"])}
        if "cross_attn" in nb:
            nb["cross_attn"] = {
                **blk["cross_attn"],
                "out": scaled(blk["cross_attn"]["out"]),
            }
        nb["mlp2"] = scaled(blk["mlp2"])
        blocks.append(nb)
    dec = {**model.params["decoder"], "blocks": blocks}
    params = {**model.params, "decoder": dec}
    return Whisper(
        model.dims,
        params,
        dtype=model.dtype,
        name=f"{model.name}-scaledtail{keep_layers}a{alpha}",
        alignment_heads=model.alignment_heads,
        vocab_path=model.vocab_path,
    )


class SpeculativeDecoder:
    def __init__(self, target_model, draft_model, gamma: int = 4):
        assert target_model.dims.n_vocab == draft_model.dims.n_vocab, (
            "target and draft must share a vocabulary"
        )
        self.target = target_model
        self.draft = draft_model
        self.gamma = gamma
        self.stats = SpecStats()

    def decode_jit(
        self,
        mel: jnp.ndarray,  # [T, n_mels]
        options: DecodingOptions = DecodingOptions(),
        tokenizer=None,
    ) -> DecodingResult:
        """Fully-jitted speculative decode: the whole draft→verify→accept
        loop runs on device as one program (_spec_loop_jit) — no host
        round-trips per token. Output is token-identical to plain greedy
        decoding of the target."""
        tokenizer, initial, cfg, d_cfg = self._configs(options, tokenizer)
        init_arr = jnp.asarray(initial, jnp.int32)[None]
        shared_encoder = self.draft.params.get("encoder") is self.target.params.get(
            "encoder"
        )
        buf, n, sum_lp, nsp, prop, acc, tp, t_feats = _spec_loop_jit(
            self.target.params,
            self.draft.params,
            mel[None].astype(self.target.dtype),
            init_arr,
            cfg,
            d_cfg,
            self.gamma,
            shared_encoder=shared_encoder,
        )
        n = int(n)
        tokens = np.asarray(buf)[0, :n].tolist()
        # the loop writes EOT into the buffer like any other token; strip it
        if tokens and tokens[-1] == cfg.eot:
            tokens.pop()
        self.stats.proposed += int(prop)
        self.stats.accepted += int(acc)
        self.stats.target_steps += int(tp)
        text = tokenizer.decode(tokens).strip()
        return DecodingResult(
            audio_features=t_feats[0],
            language=options.language or "en",
            tokens=tokens,
            text=text,
            avg_logprob=float(sum_lp) / (len(tokens) + 1),
            no_speech_prob=float(nsp),
            temperature=0.0,
            compression_ratio=compression_ratio(text) if text else float("nan"),
        )

    def decode_batch_dispatch(
        self,
        mels: jnp.ndarray,  # [B, T, n_mels]
        options: DecodingOptions = DecodingOptions(),
        tokenizer=None,
        n_real: Optional[int] = None,
    ) -> dict:
        """Launch the batched speculative decode (one jitted program per
        batch-size bucket) and return device handles without blocking —
        the speculative twin of ``decode.decode_dispatch``, so the
        pipeline's two-phase dispatch works unchanged."""
        tokenizer, initial, cfg, d_cfg = self._configs(options, tokenizer)
        b = mels.shape[0]
        init_arr = jnp.tile(jnp.asarray(initial, jnp.int32)[None], (b, 1))
        shared_encoder = self.draft.params.get("encoder") is self.target.params.get(
            "encoder"
        )
        buf, n, sum_lp, nsp, prop, acc, tp, _ = _spec_batch_jit(
            self.target.params,
            self.draft.params,
            mels.astype(self.target.dtype),
            init_arr,
            cfg,
            d_cfg,
            self.gamma,
            shared_encoder=shared_encoder,
        )
        return {
            "device": (buf, n, sum_lp, nsp, prop, acc, tp),
            "tokenizer": tokenizer,
            "cfg": cfg,
            "language": options.language or "en",
            "temperature": options.temperature,
            "n_real": b if n_real is None else int(n_real),
        }

    def decode_batch_finalize(self, handle: dict) -> list:
        """Materialize a ``decode_batch_dispatch`` call into per-row
        DecodingResults (blocks on the device); accumulates acceptance
        stats into ``self.stats`` and the global metrics tracker."""
        from whisperx_tpu.utils.metrics import GLOBAL_TRACKER

        buf, n, sum_lp, nsp, prop, acc, tp = handle["device"]
        tokenizer = handle["tokenizer"]
        cfg = handle["cfg"]
        buf = np.asarray(buf)  # [B, 1, len]
        n = np.asarray(n)
        sum_lp = np.asarray(sum_lp)
        nsp = np.asarray(nsp)
        # stats count REAL rows only — the pipeline zero-pads ragged
        # groups, and padding rows would skew the acceptance rate
        n_real = handle.get("n_real", buf.shape[0])
        prop_s, acc_s, tp_s = (
            int(np.asarray(prop)[:n_real].sum()),
            int(np.asarray(acc)[:n_real].sum()),
            int(np.asarray(tp)[:n_real].sum()),
        )
        self.stats.proposed += prop_s
        self.stats.accepted += acc_s
        self.stats.target_steps += tp_s
        GLOBAL_TRACKER.add("spec_proposed", prop_s)
        GLOBAL_TRACKER.add("spec_accepted", acc_s)
        GLOBAL_TRACKER.add("spec_target_passes", tp_s)
        results = []
        for i in range(buf.shape[0]):
            tokens = buf[i, 0, : int(n[i])].tolist()
            if tokens and tokens[-1] == cfg.eot:
                tokens.pop()
            text = tokenizer.decode(tokens).strip()
            results.append(
                DecodingResult(
                    audio_features=None,
                    language=handle["language"],
                    tokens=tokens,
                    text=text,
                    avg_logprob=float(sum_lp[i]) / (len(tokens) + 1),
                    no_speech_prob=float(nsp[i]),
                    temperature=handle["temperature"],
                    compression_ratio=compression_ratio(text)
                    if text
                    else float("nan"),
                )
            )
        return results

    def _configs(self, options: DecodingOptions, tokenizer=None):
        if tokenizer is None:
            from whisperx_tpu.decoding.tokenizer import get_tokenizer

            tokenizer = get_tokenizer(
                self.target.is_multilingual,
                num_languages=self.target.num_languages,
                language=options.language or "en",
                task=options.task,
                vocab_path=self.target.vocab_path,
            )
        sample_len = options.sample_len or self.target.dims.n_text_ctx // 2
        initial = _build_initial_tokens(
            tokenizer, options,
            n_text_ctx=self.target.dims.n_text_ctx,
            sample_len=options.sample_len,
        )
        n_init = len(initial)
        cfg = _StaticConfig(
            n_head=self.target.dims.n_text_head,
            n_text_ctx=self.target.dims.n_text_ctx,
            n_head_audio=self.target.dims.n_audio_head,
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
            suppress_blank=options.suppress_blank,
            blank_tokens=tuple(tokenizer.encode(" "))
            if options.suppress_blank
            else (),
            suppress=F.build_suppress_list(
                tokenizer,
                options.suppress_tokens,
                suppress_numerals=options.suppress_numerals,
            ),
            without_timestamps=options.without_timestamps,
            greedy=True,
        )
        d_cfg = _StaticConfig(
            **{
                **cfg.__dict__,
                "n_head": self.draft.dims.n_text_head,
                "n_text_ctx": self.draft.dims.n_text_ctx,
                "n_head_audio": self.draft.dims.n_audio_head,
            },
        )
        return tokenizer, initial, cfg, d_cfg

    def decode(
        self,
        mel: jnp.ndarray,  # [T, n_mels]
        options: DecodingOptions = DecodingOptions(),
        tokenizer=None,
    ) -> DecodingResult:
        # one config builder for the eager and jitted paths — inline copies
        # drifted (this one had dropped suppress_numerals and n_head_audio)
        tokenizer, initial, cfg, d_cfg = self._configs(options, tokenizer)
        n_init = len(initial)

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
        d_last_logits = d_logits[:, -1]  # draft's next-step logits (local —
        # instance state here would let concurrent decode() calls corrupt
        # each other's draft stream)

        while len(tokens) < cfg.sample_len:
            # --- draft proposes gamma tokens -----------------------------
            draft_tokens = []
            d_state = state
            d_last = d_last_logits
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
            d_last_logits, d_self = _step(
                self.draft.params,
                jnp.asarray([[tokens[-1]]], jnp.int32),
                d_self,
                d_cross,
                jnp.int32(n_init + len(tokens) - 1),
                d_cfg.n_head,
            )
            d_last_logits = d_last_logits[:, -1]

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
