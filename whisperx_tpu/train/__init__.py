"""Training utilities (micro-overfit proofs; the reference ships none)."""

from whisperx_tpu.train.align_micro import (
    aligned_checkpoint_cached,
    train_micro_aligned,
)
from whisperx_tpu.train.micro import (
    PHRASES,
    build_corpus,
    micro_checkpoint_cached,
    render_phrase,
    save_micro_checkpoint,
    target_tokens,
    train_micro,
)

__all__ = [
    "PHRASES",
    "aligned_checkpoint_cached",
    "build_corpus",
    "micro_checkpoint_cached",
    "render_phrase",
    "save_micro_checkpoint",
    "target_tokens",
    "train_micro",
    "train_micro_aligned",
]
