"""Persistent XLA compilation cache.

Whisper-sized programs take minutes to compile; caching them on disk makes
every process after the first start warm (the reference's analogue is its
model-singleton caches, mlx_lightning.py:42-74 — but those die with the
process). Disable with WHISPERX_TPU_NO_XLA_CACHE=1.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_cache() -> bool:
    global _enabled
    if _enabled or os.environ.get("WHISPERX_TPU_NO_XLA_CACHE"):
        return _enabled
    try:
        import jax

        cache_dir = os.environ.get(
            "WHISPERX_TPU_XLA_CACHE",
            os.path.expanduser("~/.cache/whisperx_tpu/xla_cache"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass
    return _enabled
