"""Speculative decoding tests: greedy-equivalence and acceptance stats."""

import jax.numpy as jnp
import numpy as np

from whisperx_tpu.decoding import DecodingOptions, decode
from whisperx_tpu.decoding.speculative import SpeculativeDecoder


def _mel(n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((3000, n_mels)) * 0.1, jnp.float32)


def test_self_speculative_matches_greedy(nano_model):
    """Draft == target → every proposal accepted and output token-identical
    to plain greedy decoding."""
    mel = _mel(seed=4)
    opts = DecodingOptions(language="en", sample_len=10)
    greedy = decode(nano_model, mel, opts)

    spec = SpeculativeDecoder(nano_model, nano_model, gamma=3)
    res = spec.decode(mel, opts)
    assert res.tokens == greedy.tokens
    assert spec.stats.acceptance_rate > 0.9


def test_speculative_different_draft(nano_model):
    """A different draft model still yields the target's greedy output."""
    from whisperx_tpu.models.whisper import load_model

    draft = load_model("test-nano", seed=123)  # different random weights
    mel = _mel(seed=5)
    opts = DecodingOptions(language="en", sample_len=8)
    greedy = decode(nano_model, mel, opts)

    spec = SpeculativeDecoder(nano_model, draft, gamma=2)
    res = spec.decode(mel, opts)
    assert res.tokens == greedy.tokens
    # disagreeing draft: acceptance should be low but decode still correct
    assert 0.0 <= spec.stats.acceptance_rate <= 1.0
    assert spec.stats.target_steps >= 1


def test_jitted_spec_loop_matches_greedy(nano_model):
    """The fully-jitted draft→verify→accept loop must emit the target's
    exact greedy tokens for ANY draft (exactness is structural)."""
    from whisperx_tpu.models.whisper import load_model

    draft = load_model("test-nano", seed=123)
    mel = _mel(seed=6)
    opts = DecodingOptions(language="en", sample_len=12)
    greedy = decode(nano_model, mel, opts)

    spec = SpeculativeDecoder(nano_model, draft, gamma=3)
    res = spec.decode_jit(mel, opts)
    assert res.tokens == greedy.tokens
    assert np.isfinite(res.avg_logprob)
    assert spec.stats.target_steps >= 1


def test_jitted_matches_host_loop(nano_model):
    from whisperx_tpu.models.whisper import load_model

    draft = load_model("test-nano", seed=7)
    mel = _mel(seed=8)
    opts = DecodingOptions(language="en", sample_len=10)
    host = SpeculativeDecoder(nano_model, draft, gamma=2).decode(mel, opts)
    jitted = SpeculativeDecoder(nano_model, draft, gamma=2).decode_jit(mel, opts)
    assert jitted.tokens == host.tokens


def test_zero_tail_self_draft_full_acceptance(nano_model):
    """zero_tail_model + truncated_self_draft agree EXACTLY, so acceptance
    is 1 and the verify pass amortizes the target's weight reads — the
    mechanism's upper bound, measurable with random weights."""
    from whisperx_tpu.decoding.speculative import (
        truncated_self_draft,
        zero_tail_model,
    )

    target = zero_tail_model(nano_model, keep_layers=1)
    draft = truncated_self_draft(target, 1)
    mel = _mel(seed=9)
    opts = DecodingOptions(language="en", sample_len=12)
    greedy = decode(target, mel, opts)

    spec = SpeculativeDecoder(target, draft, gamma=4)
    res = spec.decode_jit(mel, opts)
    assert res.tokens == greedy.tokens
    # all proposals before the final (EOT/sample_len-cap) iteration must
    # be accepted; the cap truncates the last iteration's tally
    assert spec.stats.acceptance_rate >= 0.75, spec.stats
    # γ tokens per verify pass → far fewer target passes than tokens
    assert spec.stats.target_steps <= max(2, len(res.tokens) // 2)


def test_jitted_vectorized_acceptance_matches_greedy(nano_model):
    """without_timestamps uses the scan-free vectorized acceptance; output
    must still equal vanilla greedy exactly."""
    from whisperx_tpu.models.whisper import load_model

    draft = load_model("test-nano", seed=21)
    mel = _mel(seed=22)
    opts = DecodingOptions(language="en", sample_len=12, without_timestamps=True)
    greedy = decode(nano_model, mel, opts)
    spec = SpeculativeDecoder(nano_model, draft, gamma=3)
    res = spec.decode_jit(mel, opts)
    assert res.tokens == greedy.tokens

    # and with a perfectly agreeing self-draft
    from whisperx_tpu.decoding.speculative import (
        truncated_self_draft,
        zero_tail_model,
    )

    target = zero_tail_model(nano_model, keep_layers=1)
    sdraft = truncated_self_draft(target, 1)
    greedy2 = decode(target, mel, opts)
    spec2 = SpeculativeDecoder(target, sdraft, gamma=4)
    res2 = spec2.decode_jit(mel, opts)
    assert res2.tokens == greedy2.tokens
    assert spec2.stats.acceptance_rate >= 0.5
