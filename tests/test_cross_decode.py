"""Fused cross-attention decode kernel vs the XLA int8 oracle.

Interpret mode on CPU; the oracle is the exact einsum path the kernel
replaces in models/whisper/model.py (int8 branch, q_len=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.ops.cross_attention_decode import cross_attention_decode


def _xla_oracle(q_eff, k8, v8):
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk",
        q_eff,
        k8.astype(q_eff.dtype),
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd",
        weights.astype(q_eff.dtype),
        v8.astype(q_eff.dtype),
        preferred_element_type=jnp.float32,
    )


def _inputs(b=2, t=300, h=4, dh=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(
        rng.standard_normal((b, 1, h, dh)).astype(np.float32), jnp.bfloat16
    )
    k8 = jnp.asarray(rng.integers(-127, 128, (b, t, h, dh)), jnp.int8)
    v8 = jnp.asarray(rng.integers(-127, 128, (b, t, h, dh)), jnp.int8)
    return q, k8, v8


@pytest.mark.parametrize("t", [256, 300, 1500])
def test_kernel_matches_xla_int8_path(t):
    """Covers: single tile (256), non-tile-multiple T clamped to one tile
    (300), and 3 tiles with a 36-row OOB-masked overhang (1500, bt=512)."""
    q, k8, v8 = _inputs(t=t)
    ref = np.asarray(_xla_oracle(q, k8, v8), np.float32)
    out = np.asarray(cross_attention_decode(q, k8, v8, interpret=True))
    assert out.shape == ref.shape
    # kernel keeps p in bf16 for the PV matmul exactly like the XLA path;
    # residual diff is bf16 rounding under different accumulation orders
    # (|V| ≤ 127, so atol 2 ≈ 1.5% of the value scale)
    np.testing.assert_allclose(out, ref, atol=2.0, rtol=2e-2)


def test_decoder_forward_kernel_vs_einsum(monkeypatch):
    """Integration: the full decoder_forward int8 branch with the kernel
    forced (interpret on CPU) matches the XLA einsum branch."""
    from whisperx_tpu.models.whisper.config import MODEL_DIMS
    from whisperx_tpu.models.whisper.model import (
        KVCache,
        decoder_forward,
        init_kv_cache,
        init_params,
        precompute_cross_kv,
        quantize_kv,
    )

    dims = MODEL_DIMS["test-nano"]
    params = init_params(dims, jax.random.PRNGKey(0), dtype=jnp.float32)
    b = 2
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (b, dims.n_audio_ctx, dims.n_audio_state)
        ),
        jnp.float32,
    )
    ck, cv = precompute_cross_kv(params, feats, dims.n_text_head)
    ck = tuple(quantize_kv(x) for x in ck)
    cv = tuple(quantize_kv(x) for x in cv)
    sk, sv = init_kv_cache(dims, b, jnp.float32)
    cache = KVCache(sk, sv, ck, cv)
    tokens = jnp.asarray([[11], [42]], jnp.int32)

    outs = {}
    for flag in ["0", "force"]:  # "0" = XLA einsum branch (the default)
        monkeypatch.setenv("WHISPERX_TPU_CROSS_DECODE", flag)
        logits, _, _ = decoder_forward(
            params, tokens, cache, jnp.int32(0), dims.n_text_head
        )
        outs[flag] = np.asarray(logits)
    np.testing.assert_allclose(outs["force"], outs["0"], atol=2e-2, rtol=2e-2)
    assert np.array_equal(
        outs["force"].argmax(-1), outs["0"].argmax(-1)
    ), "kernel path changes the greedy token"


def test_kernel_multi_tile_streaming_softmax():
    """T=1500 forces the cross-tile online-softmax recurrence; compare
    against a widened-precision (f32) oracle to pin the recurrence."""
    q, k8, v8 = _inputs(b=1, t=1500, h=2, seed=3)
    qf = q.astype(jnp.float32)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qf, k8.astype(jnp.float32))
    w = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    ref = np.asarray(
        jnp.einsum("bhqk,bkhd->bqhd", w, v8.astype(jnp.float32)), np.float32
    )
    out = np.asarray(cross_attention_decode(q, k8, v8, interpret=True))
    np.testing.assert_allclose(out, ref, atol=3.0, rtol=3e-2)
