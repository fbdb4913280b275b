"""wav2vec2-CTC acoustic model in pure functional JAX.

Replaces the torch/torchaudio/transformers wav2vec2 stack used for forced
alignment (reference alignment.py:77-110, 251-260). Supports both published
variants ("base": post-layer-norm encoder + group-norm feature extractor,
e.g. WAV2VEC2_ASR_BASE_960H; "large/xlsr": pre-layer-norm + per-layer-normed
extractor), so converted weights from either family drop in
(convert map parity: reference convert_alignment_models.py:19-115).

The emission path is fully batched: [B, samples] → [B, frames, vocab]
log-probs in one jitted program — the reference loops segments one by one
(alignment.py:237-258, "TODO: probably can get some speedup with batched
inference here"; here it's the design).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    do_stable_layer_norm: bool = False  # False: base; True: large/xlsr
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


BASE_CONFIG = Wav2Vec2Config()
LARGE_XLSR_CONFIG = Wav2Vec2Config(
    hidden_size=1024,
    num_layers=24,
    num_heads=16,
    intermediate_size=4096,
    do_stable_layer_norm=True,
    feat_extract_norm="layer",
)
# Tiny random config for unit tests.
TEST_CONFIG = Wav2Vec2Config(
    hidden_size=64,
    num_layers=2,
    num_heads=2,
    intermediate_size=128,
    conv_dim=(32, 32, 32, 32, 32, 32, 32),
)


def _ln(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _lin(key, d_in, d_out, dtype):
    scale = 1.0 / math.sqrt(d_in)
    return {
        "w": (jax.random.normal(key, (d_in, d_out)) * scale).astype(dtype),
        "b": jnp.zeros((d_out,), dtype),
    }


def init_params(cfg: Wav2Vec2Config, key: jax.Array, dtype=jnp.float32) -> Dict:
    n_convs = len(cfg.conv_dim)
    keys = jax.random.split(key, 10 + n_convs + cfg.num_layers)
    convs = []
    d_in = 1
    for i, (d_out, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        conv = {
            # per-layer key: same-shaped layers must not share weights
            "w": (
                jax.random.normal(keys[10 + i], (k, d_in, d_out))
                / math.sqrt(k * d_in)
            ).astype(dtype)
        }
        if cfg.feat_extract_norm == "layer":
            conv["ln"] = _ln(d_out, dtype)
        elif i == 0:
            conv["gn"] = _ln(d_out, dtype)  # group-norm affine (g groups = d_out)
        convs.append(conv)
        d_in = d_out

    d = cfg.hidden_size
    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[10 + n_convs + i], 6)
        layers.append(
            {
                "attn": {
                    "query": _lin(lk[0], d, d, dtype),
                    "key": _lin(lk[1], d, d, dtype),
                    "value": _lin(lk[2], d, d, dtype),
                    "out": _lin(lk[3], d, d, dtype),
                },
                "attn_ln": _ln(d, dtype),
                "mlp1": _lin(lk[4], d, cfg.intermediate_size, dtype),
                "mlp2": _lin(lk[5], cfg.intermediate_size, d, dtype),
                "mlp_ln": _ln(d, dtype),
            }
        )

    return {
        "feature_extractor": convs,
        "feature_projection": {
            "ln": _ln(cfg.conv_dim[-1], dtype),
            "proj": _lin(keys[1], cfg.conv_dim[-1], d, dtype),
        },
        "pos_conv": {
            "w": (
                jax.random.normal(
                    keys[2],
                    (cfg.num_conv_pos_embeddings, d // cfg.num_conv_pos_embedding_groups, d),
                )
                * 0.02
            ).astype(dtype),
            "b": jnp.zeros((d,), dtype),
        },
        "encoder_ln": _ln(d, dtype),
        "layers": layers,
        "lm_head": _lin(keys[3], d, cfg.vocab_size, dtype),
    }


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (
        ((xf - mu) * jax.lax.rsqrt(var + eps)) * p["g"] + p["b"]
    ).astype(x.dtype)


def _group_norm_per_channel(p, x, eps=1e-5):
    """Group-norm with num_groups == channels (wav2vec2 base conv0):
    normalize each channel over time."""
    xf = x.astype(jnp.float32)  # [B, T, C]
    mu = xf.mean(axis=1, keepdims=True)
    var = jnp.var(xf, axis=1, keepdims=True)
    return (((xf - mu) * jax.lax.rsqrt(var + eps)) * p["g"] + p["b"]).astype(x.dtype)


def _linear(p, x):
    return jnp.dot(x, p["w"], preferred_element_type=jnp.float32).astype(x.dtype) + p["b"]


def feature_extractor(params, cfg: Wav2Vec2Config, audio: jnp.ndarray) -> jnp.ndarray:
    """[B, samples] → [B, frames, conv_dim[-1]] (≈50 fps)."""
    x = audio[:, :, None]  # [B, T, 1]
    for i, (conv, k, s) in enumerate(
        zip(params["feature_extractor"], cfg.conv_kernel, cfg.conv_stride)
    ):
        x = jax.lax.conv_general_dilated(
            x,
            conv["w"].astype(x.dtype),
            window_strides=(s,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if conv.get("b") is not None:  # conv_bias=True (large/lv60/xlsr)
            x = x + conv["b"].astype(x.dtype)
        if "ln" in conv:
            x = _layer_norm(conv["ln"], x)
        elif "gn" in conv:
            x = _group_norm_per_channel(conv["gn"], x)
        x = jax.nn.gelu(x)
    return x


def _encoder_layer(p, x, n_heads, stable_ln: bool):
    def attn(h):
        b, t, d = h.shape
        dh = d // n_heads
        q = _linear(p["attn"]["query"], h).reshape(b, t, n_heads, dh)
        k = _linear(p["attn"]["key"], h).reshape(b, t, n_heads, dh)
        v = _linear(p["attn"]["value"], h).reshape(b, t, n_heads, dh)
        scores = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(dh)
        w = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(b, t, d)
        return _linear(p["attn"]["out"], o)

    def mlp(h):
        return _linear(p["mlp2"], jax.nn.gelu(_linear(p["mlp1"], h)))

    if stable_ln:  # pre-LN (large/xlsr)
        x = x + attn(_layer_norm(p["attn_ln"], x))
        x = x + mlp(_layer_norm(p["mlp_ln"], x))
    else:  # post-LN (base)
        x = _layer_norm(p["attn_ln"], x + attn(x))
        x = _layer_norm(p["mlp_ln"], x + mlp(x))
    return x


def forward(params, cfg: Wav2Vec2Config, audio: jnp.ndarray) -> jnp.ndarray:
    """[B, samples] → CTC log-prob emissions [B, frames, vocab] (f32)."""
    feats = feature_extractor(params, cfg, audio)
    h = _layer_norm(params["feature_projection"]["ln"], feats)
    h = _linear(params["feature_projection"]["proj"], h)

    # positional grouped conv (SAME-ish padding: k//2 both sides, drop one
    # trailing frame when kernel is even — HF semantics)
    k = cfg.num_conv_pos_embeddings
    pos = jax.lax.conv_general_dilated(
        h,
        params["pos_conv"]["w"].astype(h.dtype),
        window_strides=(1,),
        padding=((k // 2, k // 2),),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=cfg.num_conv_pos_embedding_groups,
    )
    if k % 2 == 0:
        pos = pos[:, :-1]
    h = h + jax.nn.gelu(pos + params["pos_conv"]["b"])
    if not cfg.do_stable_layer_norm:
        h = _layer_norm(params["encoder_ln"], h)

    for layer in params["layers"]:
        h = _encoder_layer(layer, h, cfg.num_heads, cfg.do_stable_layer_norm)

    if cfg.do_stable_layer_norm:
        h = _layer_norm(params["encoder_ln"], h)

    logits = _linear(params["lm_head"], h).astype(jnp.float32)
    return jax.nn.log_softmax(logits, axis=-1)


def output_lengths(cfg: Wav2Vec2Config, input_length: int) -> int:
    L = input_length
    for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
        L = (L - k) // s + 1
    return L
