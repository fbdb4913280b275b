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
