"""Whisper model family: config, params, forward passes, loading."""

from __future__ import annotations

import os
import warnings
from typing import Optional

import jax
import jax.numpy as jnp

from whisperx_tpu.models.whisper.config import (
    MODEL_DIMS,
    ModelDimensions,
    get_dims,
    resolve_model_name,
)
from whisperx_tpu.models.whisper.model import (
    KVCache,
    count_params,
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)


class Whisper:
    """Thin container binding dims + param pytree + metadata.

    Replaces the ``mlx_whisper.load_models.load_model`` return object
    (attribute contract pinned at reference mlx_lightning.py:73,
    mlx_whisper_optimized_final.py:148: ``dims``, ``is_multilingual``,
    ``alignment_heads``).
    """

    def __init__(
        self,
        dims: ModelDimensions,
        params,
        dtype=jnp.bfloat16,
        name: str = "custom",
        alignment_heads=None,
        vocab_path: Optional[str] = None,
    ):
        self.dims = dims
        self.params = params
        self.dtype = dtype
        self.name = name
        self.vocab_path = vocab_path
        if alignment_heads is None:
            # Public heuristic for models without a published mask: all heads
            # of the upper half of the decoder layers.
            alignment_heads = [
                (l, h)
                for l in range(dims.n_text_layer // 2, dims.n_text_layer)
                for h in range(dims.n_text_head)
            ]
        self.alignment_heads = alignment_heads

    @property
    def is_multilingual(self) -> bool:
        return self.dims.is_multilingual

    @property
    def num_languages(self) -> int:
        return self.dims.num_languages

    def embed_audio(self, mel: jnp.ndarray) -> jnp.ndarray:
        return encoder_forward(self.params, mel, self.dims.n_audio_head)


def load_model(
    name_or_path: str,
    dtype=jnp.bfloat16,
    seed: int = 0,
) -> Whisper:
    """Load a Whisper model from a converted checkpoint directory, or
    random-initialize a known architecture (hermetic test/bench mode).
    """
    from whisperx_tpu.convert.checkpoint import is_checkpoint_dir, load_checkpoint

    if is_checkpoint_dir(name_or_path):
        params, config = load_checkpoint(name_or_path, dtype=dtype)
        dims = ModelDimensions(**config["dims"])
        vocab = os.path.join(name_or_path, "vocab.tiktoken")
        if not os.path.exists(vocab):
            from whisperx_tpu.decoding.tokenizer import (
                default_partial_vocab_path,
            )

            warnings.warn(
                f"Checkpoint {name_or_path!r} has no vocab.tiktoken — using "
                "the built-in PARTIAL vocabulary (~1.3k exact entries "
                "recovered from gold artifacts; rare tokens decode to �). "
                "Re-run whisperx_tpu.convert with the tokenizer export for "
                "full text parity.",
                stacklevel=2,
            )
            partial = default_partial_vocab_path()
            vocab = partial if os.path.exists(partial) else vocab
        return Whisper(
            dims,
            params,
            dtype=dtype,
            name=config.get("name", os.path.basename(name_or_path)),
            alignment_heads=[tuple(x) for x in config["alignment_heads"]]
            if config.get("alignment_heads")
            else None,
            vocab_path=vocab if os.path.exists(vocab) else None,
        )

    name = resolve_model_name(name_or_path)
    dims = get_dims(name)
    if not name.startswith("test-"):
        warnings.warn(
            f"No converted checkpoint found for {name_or_path!r}; "
            "initializing RANDOM weights (architecture-only mode). "
            "Run whisperx_tpu.convert to produce real weights.",
            stacklevel=2,
        )
    params = init_params(dims, jax.random.PRNGKey(seed), dtype=dtype)
    return Whisper(dims, params, dtype=dtype, name=name)


__all__ = [
    "MODEL_DIMS",
    "ModelDimensions",
    "Whisper",
    "KVCache",
    "count_params",
    "decoder_forward",
    "encoder_forward",
    "get_dims",
    "init_kv_cache",
    "init_params",
    "load_model",
    "precompute_cross_kv",
    "resolve_model_name",
]
