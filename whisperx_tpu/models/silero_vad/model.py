"""Silero-style VAD network in JAX: stacked LSTM over audio windows.

TPU-native replacement for the torch.hub Silero JIT model (reference
vads/silero.py:23-49) and its MLX port (reference whisperx/vad_mlx.py:18-76):
the recurrence runs as one ``lax.scan`` over window features, batched over
audio streams, so VAD for a whole batch of files is a single device program
(vs the reference's per-file thread pool, batch_vad.py:40-89).

Weight layout matches the converter output (whisperx_tpu/convert/silero.py):
per-layer ``{"wx": [in, 4H], "wh": [H, 4H], "b": [4H]}`` with torch gate
order (i, f, g, o), plus a dense sigmoid head.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp

WINDOW_SIZE_SAMPLES = 512  # 32 ms @ 16 kHz


def init_params(
    key: jax.Array,
    input_size: int = WINDOW_SIZE_SAMPLES,
    hidden_size: int = 64,
    num_layers: int = 2,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    keys = jax.random.split(key, num_layers * 2 + 1)
    layers = []
    d_in = input_size
    for i in range(num_layers):
        scale_x = 1.0 / jnp.sqrt(d_in)
        scale_h = 1.0 / jnp.sqrt(hidden_size)
        layers.append(
            {
                "wx": (jax.random.normal(keys[2 * i], (d_in, 4 * hidden_size)) * scale_x).astype(dtype),
                "wh": (jax.random.normal(keys[2 * i + 1], (hidden_size, 4 * hidden_size)) * scale_h).astype(dtype),
                "b": jnp.zeros((4 * hidden_size,), dtype),
            }
        )
        d_in = hidden_size
    return {
        "lstm": layers,
        "head": {
            "w": (jax.random.normal(keys[-1], (hidden_size, 1)) * 0.1).astype(dtype),
            "b": jnp.zeros((1,), dtype),
        },
        "config": {"hidden_size": hidden_size, "num_layers": num_layers},
    }


def _lstm_layer(layer_params, xs):
    """xs: [T, B, D] -> outputs [T, B, H] (single direction)."""
    h_dim = layer_params["wh"].shape[0]
    b = xs.shape[1]
    h0 = jnp.zeros((b, h_dim), xs.dtype)
    c0 = jnp.zeros((b, h_dim), xs.dtype)

    wx, wh, bias = layer_params["wx"], layer_params["wh"], layer_params["b"]

    def cell(carry, x_t):
        h, c = carry
        gates = x_t @ wx + h @ wh + bias
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(cell, (h0, c0), xs)
    return ys


@jax.jit
def speech_probs(params, windows: jnp.ndarray) -> jnp.ndarray:
    """windows: [B, T, input_size] -> per-window speech prob [B, T]."""
    xs = jnp.swapaxes(windows, 0, 1)  # [T, B, D]
    for layer in params["lstm"]:
        xs = _lstm_layer(layer, xs)
    logits = xs @ params["head"]["w"] + params["head"]["b"]  # [T, B, 1]
    return jax.nn.sigmoid(logits)[..., 0].T  # [B, T]


def frame_audio(audio: jnp.ndarray, window: int = WINDOW_SIZE_SAMPLES) -> jnp.ndarray:
    """[B, L] (or [L]) -> [B, T, window] non-overlapping windows (zero-padded)."""
    if audio.ndim == 1:
        audio = audio[None]
    b, n = audio.shape
    t = -(-n // window)
    audio = jnp.pad(audio, ((0, 0), (0, t * window - n)))
    return audio.reshape(b, t, window)
