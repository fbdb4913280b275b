"""Whisper model forward-pass tests on the tiny random config."""

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.models.whisper import (
    KVCache,
    decoder_forward,
    encoder_forward,
    get_dims,
    init_kv_cache,
    precompute_cross_kv,
)


def test_encoder_shapes(nano_model):
    dims = nano_model.dims
    mel = jnp.zeros((2, 3000, dims.n_mels), jnp.float32)
    feats = encoder_forward(nano_model.params, mel, dims.n_audio_head)
    assert feats.shape == (2, dims.n_audio_ctx, dims.n_audio_state)
    assert bool(jnp.isfinite(feats.astype(jnp.float32)).all())


def test_decoder_incremental_matches_full(nano_model):
    """Prefill+steps must produce the same logits as one full forward."""
    dims = nano_model.dims
    b, t = 2, 7
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 1000, (b, t)), jnp.int32)
    mel = jnp.asarray(rng.standard_normal((b, 3000, dims.n_mels)), jnp.float32)

    feats = encoder_forward(nano_model.params, mel, dims.n_audio_head)
    ck, cv = precompute_cross_kv(nano_model.params, feats, dims.n_text_head)
    sk, sv = init_kv_cache(dims, b)
    cache = KVCache(sk, sv, ck, cv)

    full_logits, _, _ = decoder_forward(
        nano_model.params, tokens, cache, jnp.int32(0), dims.n_text_head
    )

    cache2 = KVCache(*init_kv_cache(dims, b), ck, cv)
    step_logits = []
    for i in range(t):
        lg, cache2, _ = decoder_forward(
            nano_model.params,
            tokens[:, i : i + 1],
            cache2,
            jnp.int32(i),
            dims.n_text_head,
        )
        step_logits.append(lg[:, 0])
    inc = jnp.stack(step_logits, axis=1)
    np.testing.assert_allclose(
        np.asarray(full_logits, np.float32),
        np.asarray(inc, np.float32),
        atol=0.2,  # bf16 params; f32 logits accumulate small diffs
        rtol=0.05,
    )


def test_causal_mask(nano_model):
    """Future tokens must not influence past logits."""
    dims = nano_model.dims
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 3000, dims.n_mels)), jnp.float32)
    feats = encoder_forward(nano_model.params, mel, dims.n_audio_head)
    ck, cv = precompute_cross_kv(nano_model.params, feats, dims.n_text_head)

    t1 = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    t2 = jnp.asarray([[5, 6, 9, 9]], jnp.int32)  # differ only at positions 2,3
    outs = []
    for toks in (t1, t2):
        cache = KVCache(*init_kv_cache(dims, 1), ck, cv)
        lg, _, _ = decoder_forward(
            nano_model.params, toks, cache, jnp.int32(0), dims.n_text_head
        )
        outs.append(np.asarray(lg, np.float32))
    np.testing.assert_array_equal(outs[0][:, :2], outs[1][:, :2])


def test_cross_qk_capture(nano_model):
    dims = nano_model.dims
    mel = jnp.zeros((1, 3000, dims.n_mels), jnp.float32)
    feats = encoder_forward(nano_model.params, mel, dims.n_audio_head)
    ck, cv = precompute_cross_kv(nano_model.params, feats, dims.n_text_head)
    cache = KVCache(*init_kv_cache(dims, 1), ck, cv)
    tokens = jnp.asarray([[1, 2, 3]], jnp.int32)
    _, _, cqk = decoder_forward(
        nano_model.params,
        tokens,
        cache,
        jnp.int32(0),
        dims.n_text_head,
        capture_cross_qk=True,
    )
    assert cqk.shape == (
        dims.n_text_layer,
        1,
        dims.n_text_head,
        3,
        dims.n_audio_ctx,
    )
    # pre-softmax scores: finite, and softmaxing them normalizes rows
    cqk = np.asarray(cqk, np.float32)
    assert np.isfinite(cqk).all()
    probs = np.exp(cqk - cqk.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-3)


def test_conv1d_matches_lax_conv():
    """The shifted-matmul stem is bit-for-bit the conv it replaces (f32)."""
    from whisperx_tpu.models.whisper.model import _conv1d

    rng = np.random.default_rng(0)
    for t, c_in, c_out, stride in [(64, 8, 16, 1), (64, 16, 16, 2), (30, 5, 7, 2)]:
        x = jnp.asarray(rng.standard_normal((2, t, c_in)), jnp.float32)
        p = {
            "w": jnp.asarray(rng.standard_normal((3, c_in, c_out)), jnp.float32),
            "b": jnp.asarray(rng.standard_normal((c_out,)), jnp.float32),
        }
        ref = jax.lax.conv_general_dilated(
            x,
            p["w"],
            window_strides=(stride,),
            padding=((1, 1),),
            dimension_numbers=("NHC", "HIO", "NHC"),
        ) + p["b"]
        out = _conv1d(p, x, stride)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_model_dims_registry():
    d = get_dims("large-v3")
    assert d.n_mels == 128 and d.n_vocab == 51866 and d.num_languages == 100
    d = get_dims("tiny.en")
    assert not d.is_multilingual
    d = get_dims("whisper-large-v3-turbo")
    assert d.n_text_layer == 4


def test_beam_folded_cross_attention_matches_tiled(nano_model):
    """decoder_forward(beam_groups=K) with UNTILED cross-KV must equal the
    plain path with cross-KV tiled K times along the batch — the fold is
    pure reshaping because cross-attention is per-query independent."""
    import jax.numpy as jnp

    from whisperx_tpu.models.whisper.model import (
        KVCache,
        decoder_forward,
        encoder_forward,
        precompute_cross_kv,
    )
    from whisperx_tpu.decoding.decode import init_kv_cache_like, _StaticConfig

    dims = nano_model.dims
    rng = np.random.default_rng(17)
    b, k = 2, 3
    mel = jnp.asarray(
        rng.standard_normal((b, 3000, dims.n_mels)).astype(np.float32) * 0.1
    )
    feats = encoder_forward(nano_model.params, mel, dims.n_audio_head)
    ck, cv = precompute_cross_kv(nano_model.params, feats, dims.n_text_head)

    cfg = _StaticConfig(
        n_head=dims.n_text_head, n_text_ctx=dims.n_text_ctx, eot=0,
        sot_index=0, no_speech_token=0, timestamp_begin=0, no_timestamps=0,
        sample_len=8, max_initial_timestamp_index=None, suppress_blank=True,
        blank_tokens=(), suppress=(), without_timestamps=True, greedy=True,
    )
    tokens = jnp.asarray(
        rng.integers(0, 5000, size=(b * k, 4)), jnp.int32
    )

    sk, sv = init_kv_cache_like(nano_model.params, b * k, cfg, n_init=4)
    folded_cache = KVCache(sk, sv, ck, cv)
    folded_logits, _, _ = decoder_forward(
        nano_model.params, tokens, folded_cache, jnp.int32(0),
        dims.n_text_head, beam_groups=k,
    )

    ck_t = tuple(jnp.repeat(x, k, axis=0) for x in ck)
    cv_t = tuple(jnp.repeat(x, k, axis=0) for x in cv)
    tiled_cache = KVCache(sk, sv, ck_t, cv_t)
    tiled_logits, _, _ = decoder_forward(
        nano_model.params, tokens, tiled_cache, jnp.int32(0),
        dims.n_text_head,
    )
    np.testing.assert_allclose(
        np.asarray(folded_logits), np.asarray(tiled_logits),
        atol=1e-4, rtol=1e-4,
    )
