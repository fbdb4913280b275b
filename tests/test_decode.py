"""Batched decode-loop tests on the tiny random model.

Random weights produce garbage text, but every structural property of the
decode loop is checkable: shapes, EOT masking, timestamp grammar,
suppression, determinism, batch consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.decoding import DecodingOptions, decode, detect_language, get_tokenizer
from whisperx_tpu.decoding import filters as F


def _mel(b=1, n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((b, 3000, n_mels)).astype(np.float32) * 0.1
    return jnp.asarray(m)


def test_greedy_decode_runs(nano_model):
    res = decode(
        nano_model,
        _mel()[0],
        DecodingOptions(language="en", sample_len=12),
    )
    assert res.language == "en"
    assert isinstance(res.tokens, list)
    assert len(res.tokens) <= 12
    assert np.isfinite(res.avg_logprob)
    assert 0.0 <= res.no_speech_prob <= 1.0


def test_batch_matches_single(nano_model):
    """Row i of a batched decode must equal a single decode of that row."""
    mel = _mel(b=3, seed=1)
    opts = DecodingOptions(language="en", sample_len=10)
    batch = decode(nano_model, mel, opts)
    for i in range(3):
        single = decode(nano_model, mel[i], opts)
        assert batch[i].tokens == single.tokens, f"row {i} diverged"


def test_greedy_is_deterministic(nano_model):
    opts = DecodingOptions(language="en", sample_len=10)
    r1 = decode(nano_model, _mel(seed=2)[0], opts)
    r2 = decode(nano_model, _mel(seed=2)[0], opts)
    assert r1.tokens == r2.tokens


def test_timestamp_grammar(nano_model):
    """With timestamps on, output must start with a timestamp token and
    timestamps must be non-decreasing."""
    tok = get_tokenizer(True, language="en")
    res = decode(
        nano_model, _mel(seed=3)[0], DecodingOptions(language="en", sample_len=20)
    )
    if res.tokens:
        assert res.tokens[0] >= tok.timestamp_begin
        ts = [t for t in res.tokens if t >= tok.timestamp_begin]
        assert ts == sorted(ts)


def test_without_timestamps_suppresses_them(nano_model):
    tok = get_tokenizer(True, language="en")
    res = decode(
        nano_model,
        _mel(seed=4)[0],
        DecodingOptions(language="en", sample_len=16, without_timestamps=True),
    )
    assert all(t < tok.timestamp_begin for t in res.tokens)


def test_suppressed_tokens_never_sampled(nano_model):
    tok = get_tokenizer(True, language="en")
    res = decode(
        nano_model, _mel(seed=5)[0], DecodingOptions(language="en", sample_len=24)
    )
    banned = set(F.build_suppress_list(tok, "-1"))
    assert not (set(res.tokens) & banned)


def test_sampling_with_temperature(nano_model):
    res = decode(
        nano_model,
        _mel(seed=6)[0],
        DecodingOptions(language="en", temperature=1.0, sample_len=10),
        rng=jax.random.PRNGKey(7),
    )
    assert len(res.tokens) <= 10


def test_detect_language_distribution(nano_model):
    tok = get_tokenizer(True, language="en")
    codes, probs = detect_language(nano_model, _mel(b=2, seed=8), tok)
    assert len(codes) == 2
    for p in probs:
        assert abs(sum(p.values()) - 1.0) < 1e-3
        assert set(p) == set(tok.all_language_codes)


def test_filter_state_updates():
    tok = get_tokenizer(True, language="en")
    init = jnp.asarray([[tok.sot, tok.to_language_token("en"), tok.transcribe]])
    st = F.init_filter_state(init)
    assert int(st.last_token[0]) == tok.transcribe
    ts_tok = jnp.asarray([tok.timestamp_begin + 5])
    st2 = F.update_filter_state(st, ts_tok, tok.timestamp_begin)
    assert bool(st2.has_timestamp[0])
    assert int(st2.last_timestamp[0]) == tok.timestamp_begin + 5


def test_text_must_follow_initial_timestamp():
    """Regression: at step 1 (one sampled token — the forced initial
    timestamp), the pair grammar must mask TIMESTAMPS (text follows), not
    text. The penultimate token at that step is a prompt/task token and must
    be treated as timestamp-like (Whisper's `len(seq) < 2 or ...`)."""
    tok = get_tokenizer(True, language="en")
    init = jnp.asarray([[tok.sot, tok.to_language_token("en"), tok.transcribe]])
    st = F.init_filter_state(init)
    # sample the forced initial timestamp <|0.00|>
    st = F.update_filter_state(
        st, jnp.asarray([tok.timestamp_begin]), tok.timestamp_begin
    )
    logits = jnp.zeros((1, tok.timestamp_begin + 1501), jnp.float32)
    out = F.apply_timestamp_rules(
        logits,
        st,
        timestamp_begin=tok.timestamp_begin,
        eot=tok.eot,
        no_timestamps=tok.no_timestamps,
        max_initial_timestamp_index=50,
    )
    out = np.asarray(out)
    # every timestamp token is forbidden ...
    assert np.all(np.isneginf(out[0, tok.timestamp_begin :]))
    # ... and text tokens are NOT all forbidden
    assert np.isfinite(out[0, : tok.eot]).any()


def test_decoded_token_after_initial_timestamp_is_text(nano_model):
    tok = get_tokenizer(True, language="en")
    for seed in range(4):
        res = decode(
            nano_model, _mel(seed=seed)[0], DecodingOptions(language="en", sample_len=12)
        )
        if len(res.tokens) >= 2:
            assert res.tokens[0] >= tok.timestamp_begin
            assert res.tokens[1] < tok.timestamp_begin, res.tokens[:4]


def test_int8_kv_cache_matches_bf16(nano_model):
    """Per-channel int8 cross-KV must track the fp path at the logit level.

    On random weights the text logits are near-uniform ties, so exact greedy
    trajectories are tie-sensitive; the real contract is small logit error —
    real checkpoints have far wider margins than the int8 perturbation."""
    from whisperx_tpu.models.whisper.model import (
        KVCache,
        decoder_forward,
        encoder_forward,
        init_kv_cache,
        precompute_cross_kv,
        quantize_kv,
    )

    dims = nano_model.dims
    params = nano_model.params
    mel = _mel(b=2, n_mels=dims.n_mels, seed=12)
    feats = encoder_forward(params, mel, dims.n_audio_head)
    ck, cv = precompute_cross_kv(params, feats, dims.n_text_head)
    tokens = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)

    def prefill(ck, cv):
        sk, sv = init_kv_cache(dims, 2)
        logits, _, _ = decoder_forward(
            params, tokens, KVCache(sk, sv, ck, cv), jnp.int32(0),
            dims.n_text_head,
        )
        return np.asarray(logits, np.float32)

    ref = prefill(ck, cv)
    q = prefill(
        tuple(quantize_kv(x) for x in ck), tuple(quantize_kv(x) for x in cv)
    )
    err = np.abs(ref - q).max() / (np.abs(ref).max() + 1e-9)
    assert err < 0.02, err

    # And the greedy openings still agree end-to-end.
    a = decode(nano_model, mel, DecodingOptions(language="en", sample_len=12))
    b = decode(
        nano_model,
        mel,
        DecodingOptions(language="en", sample_len=12, kv_quant=True),
    )
    for x, y in zip(a, b):
        assert x.tokens[:3] == y.tokens[:3]


def test_prompt_prefixes_initial_tokens(nano_model):
    res = decode(
        nano_model,
        _mel(seed=9)[0],
        DecodingOptions(language="en", sample_len=8, prompt="context words"),
    )
    assert len(res.tokens) <= 8  # decode still returns only sampled tokens


def test_best_of_picks_highest_avg_logprob(nano_model):
    """best_of=n at t>0 must equal manually tiling the row n times and
    keeping the candidate with the highest avg_logprob (upstream
    GreedyDecoder n_group semantics)."""
    mel = _mel(seed=7)
    rng = jax.random.PRNGKey(42)
    n = 4
    manual = decode(
        nano_model,
        jnp.repeat(mel, n, axis=0),
        DecodingOptions(language="en", sample_len=10, temperature=0.8),
        rng=rng,
    )
    best = max(manual, key=lambda r: r.avg_logprob)
    picked = decode(
        nano_model,
        mel[0],
        DecodingOptions(language="en", sample_len=10, temperature=0.8, best_of=n),
        rng=rng,
    )
    assert picked.tokens == best.tokens
    assert picked.avg_logprob == pytest.approx(best.avg_logprob)


def test_best_of_ignored_at_zero_temperature(nano_model):
    """Greedy decode is deterministic; best_of must not change it."""
    opts0 = DecodingOptions(language="en", sample_len=8)
    optsn = DecodingOptions(language="en", sample_len=8, best_of=5)
    assert (
        decode(nano_model, _mel(seed=8)[0], opts0).tokens
        == decode(nano_model, _mel(seed=8)[0], optsn).tokens
    )


def test_suppress_blank_disabled_leaves_eot_free(nano_model):
    """With suppress_blank=False upstream whisper may emit EOT at the very
    first sampled step (empty transcript on silence); the filter chain must
    not mask EOT when the option is off."""
    from whisperx_tpu.decoding.decode import _StaticConfig, _apply_filters
    from whisperx_tpu.decoding.filters import FilterState

    tok = get_tokenizer(True, language="en")

    def cfg(suppress_blank):
        return _StaticConfig(
            n_head=2, n_text_ctx=448, eot=tok.eot, sot_index=0,
            no_speech_token=tok.no_speech,
            timestamp_begin=tok.timestamp_begin,
            no_timestamps=tok.no_timestamps, sample_len=8,
            max_initial_timestamp_index=None,
            suppress_blank=suppress_blank,
            blank_tokens=tuple(tok.encode(" ")) if suppress_blank else (),
            suppress=(), without_timestamps=True, greedy=True,
        )

    logits = jnp.zeros((1, 51865), jnp.float32)
    state = FilterState(
        last_token=jnp.zeros((1,), jnp.int32),
        penult_token=jnp.zeros((1,), jnp.int32),
        last_timestamp=jnp.full((1,), tok.timestamp_begin, jnp.int32),
        has_timestamp=jnp.zeros((1,), bool),
        step=jnp.int32(0),
    )
    masked = _apply_filters(logits, state, cfg(True))
    free = _apply_filters(logits, state, cfg(False))
    assert np.isneginf(np.asarray(masked)[0, tok.eot])
    assert np.asarray(free)[0, tok.eot] == 0.0


def test_huge_prefix_truncated_not_crashing(nano_model):
    """A prefix near/above n_text_ctx must be trimmed (upstream semantics),
    not drive sample_len negative."""
    prefix = list(range(300, 800))  # 500 tokens > n_ctx=448
    res = decode(
        nano_model,
        _mel(seed=11)[0],
        DecodingOptions(language="en", prefix=prefix, sample_len=16,
                        without_timestamps=True),
    )
    assert isinstance(res.tokens, list)


def test_beam_dispatch_does_not_materialize(nano_model):
    """Beam decode_dispatch must return a device handle (two-phase
    contract), with materialization deferred to decode_finalize."""
    from whisperx_tpu.decoding.decode import decode_dispatch, decode_finalize

    handle = decode_dispatch(
        nano_model, _mel(b=2, seed=12),
        DecodingOptions(language="en", beam_size=2, sample_len=8),
    )
    assert "done" not in handle and "beam_device" in handle
    results = decode_finalize(handle)
    assert len(results) == 2 and all(r.audio_features is None for r in results)


def test_best_of_selection_honors_length_penalty():
    """Candidate pick must use upstream's ((5+len)/6)**penalty score."""
    from whisperx_tpu.decoding.decode import decode_finalize

    tok = get_tokenizer(True, language="en")
    # cand0: short, lower total; cand1: long, higher total.
    tokens = np.array([[5, tok.eot, 0, 0], [5, 6, 7, tok.eot]])
    lengths = np.array([2, 4])
    sums = np.array([-1.0, -1.5])
    nsp = np.zeros(2)

    def run(lp):
        handle = {
            "device": (tokens, lengths, sums, nsp, None),
            "b": 1, "n_cand": 2, "single": True, "tokenizer": tok,
            "language": "en", "language_probs": [None],
            "options": DecodingOptions(temperature=0.7, best_of=2,
                                       length_penalty=lp),
            "keep_audio_features": False,
        }
        return decode_finalize(handle)

    # length-normalized (None): -1/3 vs -1.5/5 → cand1 wins
    assert len(run(None).tokens) == 4
    # strong length penalty boosts short: -1/((7/6)**4) vs -1.5/((9/6)**4)
    # = -0.54 vs -0.30 → still cand1... use penalty favoring short:
    # lp=0 → raw sums: -1.0 > -1.5 → cand0 wins
    assert len(run(0.0).tokens) == 2


def test_auto_language_detection_shares_encoder(nano_model):
    """language=None path: detection + decode share one encoder pass and
    still produce a valid result with language_probs."""
    res = decode(
        nano_model, _mel(seed=13)[0],
        DecodingOptions(language=None, sample_len=8, without_timestamps=True),
    )
    assert res.language is not None
    assert res.language_probs and isinstance(res.language_probs, dict)
