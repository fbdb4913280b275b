"""ResNet34 speaker-embedding network (wespeaker family) in JAX.

The neural embedding model behind pyannote/speaker-diarization-3.1
(wespeaker-voxceleb-resnet34-LM): 80-dim fbank features → ResNet34 trunk →
temporal statistics pooling (mean ‖ std) → linear projection to a 256-dim
speaker embedding. Replaces the torch embedding stage of the reference's
diarization (whisperx/diarize.py:11-83 via pyannote.audio) with a jitted,
batched device program; host AHC clustering stays in
whisperx_tpu/diarize/clustering.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.audio.mel import mel_filters


@dataclasses.dataclass(frozen=True)
class ResNetSpeakerConfig:
    channels: Tuple[int, ...] = (32, 64, 128, 256)
    blocks: Tuple[int, ...] = (3, 4, 6, 3)
    n_mels: int = 80
    embed_dim: int = 256


TEST_CONFIG = ResNetSpeakerConfig(channels=(4, 8, 8, 8), blocks=(1, 1, 1, 1), embed_dim=16)


def _conv_init(key, k, c_in, c_out, dtype):
    scale = 1.0 / math.sqrt(k * k * c_in)
    return (jax.random.normal(key, (k, k, c_in, c_out)) * scale).astype(dtype)


def _bn_init(c, dtype):
    return {
        "g": jnp.ones((c,), dtype),
        "b": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }


def init_params(cfg: ResNetSpeakerConfig, key: jax.Array, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 256))
    params = {
        "stem": {"w": _conv_init(next(keys), 3, 1, cfg.channels[0], dtype),
                 "bn": _bn_init(cfg.channels[0], dtype)},
        "stages": [],
    }
    c_in = cfg.channels[0]
    for stage, (c_out, n_blocks) in enumerate(zip(cfg.channels, cfg.blocks)):
        blocks = []
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            block = {
                "conv1": _conv_init(next(keys), 3, c_in, c_out, dtype),
                "bn1": _bn_init(c_out, dtype),
                "conv2": _conv_init(next(keys), 3, c_out, c_out, dtype),
                "bn2": _bn_init(c_out, dtype),
            }
            if stride != 1 or c_in != c_out:
                block["down"] = {
                    "w": _conv_init(next(keys), 1, c_in, c_out, dtype),
                    "bn": _bn_init(c_out, dtype),
                }
            blocks.append(block)
            c_in = c_out
        params["stages"].append(blocks)

    freq_out = cfg.n_mels // (2 ** (len(cfg.channels) - 1))
    pooled = cfg.channels[-1] * freq_out * 2  # mean ‖ std
    params["proj"] = {
        "w": (jax.random.normal(next(keys), (pooled, cfg.embed_dim)) * 0.02).astype(dtype),
        "b": jnp.zeros((cfg.embed_dim,), dtype),
    }
    return params


def _bn(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * inv * p["g"] + p["b"]


def _conv2d(w, x, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _block(p, x, stride):
    h = jax.nn.relu(_bn(p["bn1"], _conv2d(p["conv1"], x, stride)))
    h = _bn(p["bn2"], _conv2d(p["conv2"], h, 1))
    if "down" in p:
        x = _bn(p["down"]["bn"], _conv2d(p["down"]["w"], x, stride))
    return jax.nn.relu(x + h)


def fbank(audio: jnp.ndarray, n_mels: int = 80) -> jnp.ndarray:
    """[B, samples] → log-mel fbank [B, T, n_mels] (mean-normalized)."""
    from whisperx_tpu.audio.mel import _stft_power
    from whisperx_tpu.audio.constants import HOP_LENGTH, N_FFT

    half = N_FFT // 2
    n_frames = audio.shape[-1] // HOP_LENGTH
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
    power = _stft_power(padded, n_frames)  # [B, T, F]
    filters = jnp.asarray(mel_filters(n_mels))
    mel = jnp.einsum("btf,mf->btm", power, filters)
    logmel = jnp.log(jnp.maximum(mel, 1e-10))
    return logmel - logmel.mean(axis=1, keepdims=True)  # CMN


def embed(params: Dict, cfg: ResNetSpeakerConfig, audio: jnp.ndarray) -> jnp.ndarray:
    """[B, samples] → unit-norm speaker embeddings [B, embed_dim]."""
    feats = fbank(audio, cfg.n_mels)  # [B, T, M]
    x = feats[..., None]  # [B, T, M, 1] → NHWC with H=T, W=M
    x = jax.nn.relu(_bn(params["stem"]["bn"], _conv2d(params["stem"]["w"], x, 1)))
    for stage, blocks in enumerate(params["stages"]):
        for b, block in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _block(block, x, stride)
    # temporal statistics pooling over the time axis
    b_, t_, f_, c_ = x.shape
    flat = x.reshape(b_, t_, f_ * c_)
    mean = flat.mean(axis=1)
    std = jnp.sqrt(jnp.maximum(flat.var(axis=1), 1e-7))
    stats = jnp.concatenate([mean, std], axis=-1)
    emb = stats @ params["proj"]["w"] + params["proj"]["b"]
    return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-9)


class ResNetSpeakerEmbedding:
    """Diarization embedding backend (interface: embed([B, samples]) → [B, D])."""

    def __init__(self, params=None, config: ResNetSpeakerConfig = TEST_CONFIG):
        if params is None:
            params = init_params(config, jax.random.PRNGKey(0))
        self.params = params
        self.config = config
        self.dim = config.embed_dim
        self._jitted = jax.jit(lambda p, a: embed(p, config, a))

    @classmethod
    def from_checkpoint(cls, path: str) -> "ResNetSpeakerEmbedding":
        from whisperx_tpu.convert.checkpoint import load_checkpoint

        params, meta = load_checkpoint(path)
        cfg_dict = meta["config"]
        cfg = ResNetSpeakerConfig(
            channels=tuple(cfg_dict["channels"]),
            blocks=tuple(cfg_dict["blocks"]),
            n_mels=cfg_dict["n_mels"],
            embed_dim=cfg_dict["embed_dim"],
        )
        return cls(params, cfg)

    def embed(self, windows: np.ndarray) -> np.ndarray:
        return np.asarray(self._jitted(self.params, jnp.asarray(windows, jnp.float32)))
