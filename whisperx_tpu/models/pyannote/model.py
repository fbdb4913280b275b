"""PyanNet-style segmentation network in JAX (pyannote/segmentation family).

Replaces the torch pyannote segmentation model used by the reference's
PyAnnote VAD (whisperx/vads/pyannote.py:58-80) and diarization. The SincNet
front end's learned band-pass filters are materialized into ordinary conv
kernels at conversion time, so the runtime model is: 3 conv+pool+norm
blocks → stacked bidirectional LSTM → linear stack → frame classifier.

Output: per-frame class scores (powerset speaker activity for segmentation,
or 1 class for plain VAD), ~59 frames / 10 s window at 16 kHz.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class PyanNetConfig:
    sincnet_filters: Tuple[int, ...] = (80, 60, 60)
    sincnet_kernels: Tuple[int, ...] = (251, 5, 5)
    sincnet_strides: Tuple[int, ...] = (10, 1, 1)
    pool_size: int = 3
    lstm_hidden: int = 128
    lstm_layers: int = 4
    linear_dims: Tuple[int, ...] = (128, 128)
    num_classes: int = 7  # powerset for ≤3 speakers / ≤2 overlap

TEST_CONFIG = PyanNetConfig(
    sincnet_filters=(8, 8, 8),
    lstm_hidden=16,
    lstm_layers=1,
    linear_dims=(16,),
    num_classes=3,
)


def init_params(cfg: PyanNetConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 16)
    convs = []
    d_in = 1
    for i, (f, k) in enumerate(zip(cfg.sincnet_filters, cfg.sincnet_kernels)):
        convs.append(
            {
                "w": (jax.random.normal(keys[i], (k, d_in, f)) * 0.02).astype(dtype),
                "norm": {"g": jnp.ones((f,), dtype), "b": jnp.zeros((f,), dtype)},
            }
        )
        d_in = f

    lstms = []
    lstm_in = cfg.sincnet_filters[-1]
    for i in range(cfg.lstm_layers):
        layer = {}
        for direction in ("fwd", "bwd"):
            kk = jax.random.split(keys[4 + i], 2)[0 if direction == "fwd" else 1]
            layer[direction] = {
                "wx": (jax.random.normal(kk, (lstm_in, 4 * cfg.lstm_hidden)) * 0.05).astype(dtype),
                "wh": (jax.random.normal(kk, (cfg.lstm_hidden, 4 * cfg.lstm_hidden)) * 0.05).astype(dtype),
                "b": jnp.zeros((4 * cfg.lstm_hidden,), dtype),
            }
        lstms.append(layer)
        lstm_in = 2 * cfg.lstm_hidden

    linears = []
    d = lstm_in
    for i, out in enumerate(cfg.linear_dims):
        linears.append(
            {
                "w": (jax.random.normal(keys[10 + i], (d, out)) * 0.05).astype(dtype),
                "b": jnp.zeros((out,), dtype),
            }
        )
        d = out

    return {
        "wav_norm": {"g": jnp.ones((1,), dtype), "b": jnp.zeros((1,), dtype)},
        "sincnet": convs,
        "lstm": lstms,
        "linear": linears,
        "classifier": {
            "w": (jax.random.normal(keys[-1], (d, cfg.num_classes)) * 0.05).astype(dtype),
            "b": jnp.zeros((cfg.num_classes,), dtype),
        },
    }


def _instance_norm(p, x, eps=1e-5):
    # normalize each channel over time, per sample: x [B, T, C]
    mu = x.mean(axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _lstm_dir(p, xs, reverse: bool):
    h_dim = p["wh"].shape[0]
    b = xs.shape[1]
    init = (jnp.zeros((b, h_dim), xs.dtype), jnp.zeros((b, h_dim), xs.dtype))

    def cell(carry, x_t):
        h, c = carry
        gates = x_t @ p["wx"] + h @ p["wh"] + p["b"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(cell, init, xs, reverse=reverse)
    return ys


def forward(params: Dict, cfg: PyanNetConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """audio [B, samples] → frame log-scores [B, frames, num_classes]."""
    x = audio[:, :, None]  # [B, T, 1]
    if "wav_norm" in params:
        # pyannote SincNet first instance-norms the raw waveform
        # (wav_norm1d) — without it a converted checkpoint sees arbitrary
        # input gain and the powerset activations diverge
        x = _instance_norm(params["wav_norm"], x)
    for ci, (conv, stride) in enumerate(
        zip(params["sincnet"], cfg.sincnet_strides)
    ):
        x = jax.lax.conv_general_dilated(
            x,
            conv["w"].astype(x.dtype),
            window_strides=(stride,),
            padding="VALID",
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        if ci == 0:  # pyannote applies abs to the sinc layer ONLY
            x = jnp.abs(x)
        # max-pool over time
        x = jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            (1, cfg.pool_size, 1),
            (1, cfg.pool_size, 1),
            "VALID",
        )
        x = _instance_norm(conv["norm"], x)
        x = jnp.where(x > 0, x, 0.01 * x)  # leaky relu

    xs = jnp.swapaxes(x, 0, 1)  # [T, B, C]
    for layer in params["lstm"]:
        fwd = _lstm_dir(layer["fwd"], xs, reverse=False)
        bwd = _lstm_dir(layer["bwd"], xs, reverse=True)
        xs = jnp.concatenate([fwd, bwd], axis=-1)
    x = jnp.swapaxes(xs, 0, 1)  # [B, T, 2H]

    for lin in params["linear"]:
        x = jnp.tanh(x @ lin["w"] + lin["b"])
    logits = x @ params["classifier"]["w"] + params["classifier"]["b"]
    return jax.nn.log_softmax(logits, axis=-1)
