"""Whisper encoder-decoder in pure functional JAX.

Replaces the external ``mlx_whisper`` model layer the reference depends on
(SURVEY.md §2.9; usage pinned at backends/mlx_lightning.py:9-11,
mlx_whisper_batch_decoder.py:11-15). TPU-native design choices:

  - params are a plain pytree of jnp arrays (bf16 by default) — trivially
    shardable with `jax.sharding` and donat-able across decode steps;
  - the KV cache is preallocated at ``[L, B, n_text_ctx, H, Dh]`` with masked
    attention over the full context — static shapes, no ragged
    extract/scatter (contrast reference mlx_whisper_batch_decoder.py:102-259);
  - attention contractions run on the MXU in bf16 with f32 accumulation;
    softmax / layernorm statistics are f32;
  - cross-attention K/V are computed once per segment and reused every step;
  - cross-attention probabilities can be captured in a single teacher-forced
    pass for DTW word timing (reference timing contract, SURVEY.md §2.9).
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.models.whisper.config import ModelDimensions
from whisperx_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS, shard

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _linear_init(key, d_in, d_out, dtype, bias=True):
    w_key, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(d_in)
    p = {"w": (jax.random.normal(w_key, (d_in, d_out)) * scale).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _ln_init(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _conv_init(key, d_in, d_out, width, dtype):
    scale = 1.0 / math.sqrt(d_in * width)
    return {
        "w": (jax.random.normal(key, (width, d_in, d_out)) * scale).astype(dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def _block_init(key, d, dtype, cross: bool):
    keys = jax.random.split(key, 10)
    p = {
        "attn": {
            "query": _linear_init(keys[0], d, d, dtype),
            "key": _linear_init(keys[1], d, d, dtype, bias=False),
            "value": _linear_init(keys[2], d, d, dtype),
            "out": _linear_init(keys[3], d, d, dtype),
        },
        "attn_ln": _ln_init(d, dtype),
        "mlp1": _linear_init(keys[4], d, 4 * d, dtype),
        "mlp2": _linear_init(keys[5], 4 * d, d, dtype),
        "mlp_ln": _ln_init(d, dtype),
    }
    if cross:
        p["cross_attn"] = {
            "query": _linear_init(keys[6], d, d, dtype),
            "key": _linear_init(keys[7], d, d, dtype, bias=False),
            "value": _linear_init(keys[8], d, d, dtype),
            "out": _linear_init(keys[9], d, d, dtype),
        }
        p["cross_attn_ln"] = _ln_init(d, dtype)
    return p


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Fixed sinusoidal position embedding (encoder)."""
    assert channels % 2 == 0
    log_timescale_increment = math.log(10000) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_timescale_increment * np.arange(channels // 2))
    scaled_time = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled_time), np.cos(scaled_time)], axis=1).astype(
        np.float32
    )


def init_params(
    dims: ModelDimensions, key: jax.Array, dtype=jnp.bfloat16
) -> Params:
    ek, dk, tk, pk, c1, c2 = jax.random.split(key, 6)
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    enc_keys = jax.random.split(ek, dims.n_audio_layer)
    dec_keys = jax.random.split(dk, dims.n_text_layer)
    return {
        "encoder": {
            "conv1": _conv_init(c1, dims.n_mels, d_a, 3, dtype),
            "conv2": _conv_init(c2, d_a, d_a, 3, dtype),
            "pos_emb": jnp.asarray(sinusoids(dims.n_audio_ctx, d_a), dtype),
            "blocks": [_block_init(k, d_a, dtype, cross=False) for k in enc_keys],
            "ln_post": _ln_init(d_a, dtype),
        },
        "decoder": {
            "tok_emb": (
                jax.random.normal(tk, (dims.n_vocab, d_t)) * 0.02
            ).astype(dtype),
            "pos_emb": (
                jax.random.normal(pk, (dims.n_text_ctx, d_t)) * 0.01
            ).astype(dtype),
            "blocks": [_block_init(k, d_t, dtype, cross=True) for k in dec_keys],
            "ln": _ln_init(d_t, dtype),
        },
    }


# ---------------------------------------------------------------------------
# Primitive layers
# ---------------------------------------------------------------------------


def layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def linear(p, x):
    if not isinstance(p, dict):  # weight-only QuantizedLinear (whisperx_tpu.quant)
        from whisperx_tpu.quant.core import quant_linear_apply

        return quant_linear_apply(p, x)
    y = jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "b" in p:
        y = y + p["b"]
    return y


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head)


def _merge_heads(x):
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def qkv_attention(
    q: jnp.ndarray,  # [B, Tq, H, Dh]
    k: jnp.ndarray,  # [B, Tk, H, Dh]
    v: jnp.ndarray,  # [B, Tk, H, Dh]
    mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, H, Tq, Tk], additive
    return_weights: bool = False,
):
    dh = q.shape[-1]
    scale = dh ** -0.25
    qf = (q * scale).astype(q.dtype)
    kf = (k * scale).astype(k.dtype)
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", qf, kf, preferred_element_type=jnp.float32
    )
    if mask is not None:
        scores = scores + mask
    weights = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)
    # return_weights yields the PRE-softmax scaled QK scores — word-timing
    # DTW re-normalizes over a truncated frame range (whisper timing
    # semantics), so the raw scores are what downstream needs.
    return (out, scores) if return_weights else (out, None)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv1d(p, x, stride):
    """Width-3, pad-1 conv as THREE shifted matmuls on the MXU.

    XLA's 1-D conv lowering ran the stem at 2% MXU utilization (38.7 ms
    of a 249 ms batch-8 large-v3 encoder pass, tools/profile_encoder.py);
    y[o] = Σ_w x[o·stride − 1 + w] @ W[w] is exactly three dense GEMMs
    over strided views, which is the shape the MXU wants.

    x: [B, T, C]; w: [3, I, O]; same semantics as
    lax.conv_general_dilated(NHC, HIO, stride, pad (1,1)) — pinned by
    tests/test_whisper_model.py::test_conv1d_matches_lax_conv.
    """
    w = p["w"].astype(x.dtype)
    t = x.shape[1]
    t_out = (t + 2 - 3) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    y = None
    for i in range(3):
        xs = jax.lax.slice_in_dim(xp, i, i + t, axis=1)
        if stride != 1:
            xs = xs[:, ::stride]
        xs = xs[:, :t_out]
        yi = jnp.dot(xs, w[i], preferred_element_type=jnp.float32)
        y = yi if y is None else y + yi
    return y.astype(x.dtype) + p["b"]


def encoder_forward(params: Params, mel: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """mel: [B, T=3000, n_mels] → audio features [B, 1500, d]."""
    enc = params["encoder"]
    x = shard(mel, DATA_AXIS)
    x = jax.nn.gelu(_conv1d(enc["conv1"], x, stride=1))
    x = jax.nn.gelu(_conv1d(enc["conv2"], x, stride=2))
    x = x + enc["pos_emb"][None, : x.shape[1]]
    x = shard(x, DATA_AXIS)
    for blk in enc["blocks"]:
        x = _encoder_block(blk, x, n_head)
    return layer_norm(enc["ln_post"], x)


def _use_flash_attention() -> bool:
    # Default ON since round 2: the Pallas kernel saves the materialized
    # [B,H,1500,1500] score traffic (138 → 144× e2e RTF, same-day A/B).
    # Round 1 measured "parity" with a timer that didn't sync through the
    # device tunnel. flash_attention() still falls back to XLA on CPU and
    # below its score-size threshold; WHISPERX_TPU_FLASH=0 disables.
    import os

    return os.environ.get("WHISPERX_TPU_FLASH", "1") == "1"


def _use_cross_decode() -> bool:
    from whisperx_tpu.ops.cross_attention_decode import use_cross_decode_kernel

    return use_cross_decode_kernel()


def _encoder_block(p, x, n_head):
    h = layer_norm(p["attn_ln"], x)
    q = shard(_split_heads(linear(p["attn"]["query"], h), n_head), DATA_AXIS, None, MODEL_AXIS)
    k = shard(_split_heads(linear(p["attn"]["key"], h), n_head), DATA_AXIS, None, MODEL_AXIS)
    v = shard(_split_heads(linear(p["attn"]["value"], h), n_head), DATA_AXIS, None, MODEL_AXIS)
    if _use_flash_attention():
        from whisperx_tpu.ops.flash_attention import flash_attention

        attn = flash_attention(q, k, v)
    else:
        attn, _ = qkv_attention(q, k, v)
    x = x + linear(p["attn"]["out"], _merge_heads(attn))
    h = layer_norm(p["mlp_ln"], x)
    h = jax.nn.gelu(linear(p["mlp1"], h))
    h = shard(h, DATA_AXIS, None, MODEL_AXIS)
    x = x + linear(p["mlp2"], h)
    return shard(x, DATA_AXIS)


# ---------------------------------------------------------------------------
# Decoder with static KV cache
# ---------------------------------------------------------------------------


class QuantizedKV(NamedTuple):
    """int8 cross-KV with per-(batch, head, channel) scales.

    The AR decode step's dominant HBM read is the cross-attention K/V
    (≈8 GB/step at batch 16 for large-v3 in bf16). Per-channel int8 halves
    it, and the scales FOLD INTO the query / attention output — no
    dequantized copy is ever materialized:
      scores = (q · s_k) @ k8ᵀ        (k8 upcast fuses into the dot)
      out    = (p @ v8) · s_v
    """

    q8: jnp.ndarray  # [B, T, H, D] int8
    scale: jnp.ndarray  # [B, 1, H, D]


def quantize_kv(x: jnp.ndarray) -> QuantizedKV:
    """[B, T, H, D] → per-(b,h,d)-channel int8 over the T axis."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-10)
    q8 = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(
        jnp.int8
    )
    return QuantizedKV(q8, scale.astype(jnp.float32))


class KVCache(NamedTuple):
    """Static-shape decoder cache, one array per layer.

    self_k/self_v: tuple of [B, n_text_ctx, H, Dh] — written at the decode
    offset (per-layer arrays keep XLA's in-place update analysis trivial —
    no whole-stack copy nodes).
    cross_k/cross_v: tuple of [B, n_audio_ctx, H, Dh] — computed once per
    segment, read-only thereafter.
    """

    self_k: Tuple[jnp.ndarray, ...]
    self_v: Tuple[jnp.ndarray, ...]
    cross_k: Tuple[jnp.ndarray, ...]
    cross_v: Tuple[jnp.ndarray, ...]


def init_kv_cache(
    dims: ModelDimensions, batch: int, dtype=jnp.bfloat16
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    h = dims.n_text_head
    dh = dims.n_text_state // h
    shape = (batch, dims.n_text_ctx, h, dh)
    zeros = tuple(jnp.zeros(shape, dtype) for _ in range(dims.n_text_layer))
    return zeros, tuple(jnp.zeros(shape, dtype) for _ in range(dims.n_text_layer))


def precompute_cross_kv(
    params: Params, audio_features: jnp.ndarray, n_head: int
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Per-layer cross-attention K/V tuples of [B, 1500, H, Dh]."""
    ks, vs = [], []
    for blk in params["decoder"]["blocks"]:
        ks.append(_split_heads(linear(blk["cross_attn"]["key"], audio_features), n_head))
        vs.append(_split_heads(linear(blk["cross_attn"]["value"], audio_features), n_head))
    return tuple(ks), tuple(vs)


def decoder_forward(
    params: Params,
    tokens: jnp.ndarray,  # [B, T_new] int32
    cache: KVCache,
    offset: jnp.ndarray,  # scalar int32: number of tokens already in cache
    n_head: int,
    capture_cross_qk: bool = False,
    beam_groups: int = 1,
) -> Tuple[jnp.ndarray, KVCache, Optional[jnp.ndarray]]:
    """One decoder pass over T_new tokens starting at ``offset``.

    Returns (logits [B, T_new, vocab] float32, updated cache,
    cross-attn weights [L, B, H, T_new, 1500] if captured else None).

    ``beam_groups`` > 1: the token batch is B·K beam rows sharing every
    group of K rows' audio, and ``cache.cross_k/v`` hold the UNTILED
    [B, 1500, H, Dh] K/V. Cross-attention is per-query independent, so the
    K beams fold into the query axis ([B·K, T, H, D] → [B, K·T, H, D]) and
    attend against one copy — the decode step's dominant HBM read stays 1×
    instead of K×. Self-attention state remains per-beam.
    """
    assert not (capture_cross_qk and beam_groups > 1), (
        "cross-QK capture is per-row; beam folding not supported"
    )
    dec = params["decoder"]
    b, t_new = tokens.shape
    # the cache may be allocated SHORTER than n_text_ctx (batched decode
    # caps generation at sample_len — attending over unused slots wastes
    # HBM reads every step)
    cache_len = cache.self_k[0].shape[1]

    positions = offset + jnp.arange(t_new)
    x = dec["tok_emb"][tokens] + dec["pos_emb"][positions][None]
    x = shard(x, DATA_AXIS)

    # Additive causal mask over the static cache: query i (global pos
    # offset+i) may attend to cache slots 0..offset+i.
    q_pos = positions[:, None]  # [T_new, 1]
    k_pos = jnp.arange(cache_len)[None, :]  # [1, cache_len]
    self_mask = jnp.where(k_pos <= q_pos, 0.0, -jnp.inf).astype(jnp.float32)

    new_self_k = list(cache.self_k)
    new_self_v = list(cache.self_v)
    cross_qks = [] if capture_cross_qk else None

    for i, blk in enumerate(dec["blocks"]):
        h = layer_norm(blk["attn_ln"], x)
        # (measured: fusing q/k/v into one [D,3D] matmul changes the decode
        # step 8.03 → 7.92 ms — XLA's launch overhead is not the
        # bottleneck, and the hoisted concat costs 315 MB of HBM; see
        # docs/PERFORMANCE.md negative results)
        q = _split_heads(linear(blk["attn"]["query"], h), n_head)
        k = _split_heads(linear(blk["attn"]["key"], h), n_head)
        v = _split_heads(linear(blk["attn"]["value"], h), n_head)
        layer_k = jax.lax.dynamic_update_slice(
            new_self_k[i], k.astype(new_self_k[i].dtype), (0, offset, 0, 0)
        )
        layer_v = jax.lax.dynamic_update_slice(
            new_self_v[i], v.astype(new_self_v[i].dtype), (0, offset, 0, 0)
        )
        new_self_k[i] = layer_k
        new_self_v[i] = layer_v
        attn, _ = qkv_attention(q, layer_k, layer_v, mask=self_mask[None, None])
        x = x + linear(blk["attn"]["out"], _merge_heads(attn))

        h = layer_norm(blk["cross_attn_ln"], x)
        cq = _split_heads(linear(blk["cross_attn"]["query"], h), n_head)
        if beam_groups > 1:  # fold beams into the query axis (see docstring)
            cq = cq.reshape(
                b // beam_groups, beam_groups * t_new, n_head, -1
            )
        ck_i, cv_i = cache.cross_k[i], cache.cross_v[i]
        if isinstance(ck_i, QuantizedKV):
            dh = cq.shape[-1]
            # fold the K channel scales and the 1/sqrt(dh) into q; the int8
            # upcast fuses into the dot (HBM still reads int8)
            q_eff = (
                cq.astype(jnp.float32) * ck_i.scale * (dh**-0.5)
            ).astype(cq.dtype)
            if (
                t_new == 1
                and beam_groups == 1
                and not capture_cross_qk
                and _use_cross_decode()
            ):
                # experimental opt-in (measured NEGATIVE result — the
                # q_len=1 stream is MXU-feed-bound and the einsum below
                # already sits at that wall; see ops/cross_attention_decode
                # docstring and tools/probe_kv_layout.py)
                from whisperx_tpu.ops.cross_attention_decode import (
                    cross_attention_decode,
                )

                cattn = cross_attention_decode(q_eff, ck_i.q8, cv_i.q8)
                cw = None
            else:
                scores = jnp.einsum(
                    "bqhd,bkhd->bhqk",
                    q_eff,
                    ck_i.q8.astype(cq.dtype),
                    preferred_element_type=jnp.float32,
                )
                weights = jax.nn.softmax(scores, axis=-1)
                cattn = jnp.einsum(
                    "bhqk,bkhd->bqhd",
                    weights.astype(cq.dtype),
                    cv_i.q8.astype(cq.dtype),
                    preferred_element_type=jnp.float32,
                )
                cw = scores if capture_cross_qk else None
            # [B,1,H,D] V scales broadcast over the query axis
            cattn = (cattn * cv_i.scale).astype(cq.dtype)
        else:
            cattn, cw = qkv_attention(
                cq, ck_i, cv_i, return_weights=capture_cross_qk
            )
        if capture_cross_qk:
            cross_qks.append(cw)
        if beam_groups > 1:  # unfold back to per-beam rows
            cattn = cattn.reshape(b, t_new, n_head, -1)
        x = x + linear(blk["cross_attn"]["out"], _merge_heads(cattn))

        h = layer_norm(blk["mlp_ln"], x)
        h = jax.nn.gelu(linear(blk["mlp1"], h))
        x = x + linear(blk["mlp2"], h)
        x = shard(x, DATA_AXIS)

    x = layer_norm(dec["ln"], x)
    logits = jnp.dot(
        x, dec["tok_emb"].T, preferred_element_type=jnp.float32
    )
    new_cache = KVCache(
        tuple(new_self_k), tuple(new_self_v), cache.cross_k, cache.cross_v
    )
    cqk = jnp.stack(cross_qks) if capture_cross_qk else None
    return logits, new_cache, cqk


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
