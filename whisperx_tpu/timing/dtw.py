"""Dynamic time warping on the token×frame alignment cost matrix.

Replaces the numba/scipy DTW helpers the reference leans on
(median_filter_fix.py:6-35; mlx_whisper.timing contract, SURVEY.md §2.9).
The O(N·M) cost recursion runs as a jitted double ``lax.scan`` (no numba,
no Python frame loop); the backtrace is a short host loop.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.inf


@jax.jit
def _dtw_cost(x: jnp.ndarray) -> jnp.ndarray:
    """x: [N, M] cost matrix → accumulated cost [N+1, M+1] with the
    standard (diag, up, left) recursion and inf borders."""
    n, m = x.shape

    row0 = jnp.full((m + 1,), INF).at[0].set(0.0)

    def outer(prev_row, x_row):
        # cost[i, j] = x[i-1, j-1] + min(cost[i-1,j-1], cost[i-1,j], cost[i,j-1])
        def inner(left, inputs):
            diag, up, xv = inputs
            c = xv + jnp.minimum(jnp.minimum(diag, up), left)
            return c, c

        _, row_tail = jax.lax.scan(
            inner, INF, (prev_row[:-1], prev_row[1:], x_row)
        )
        new_row = jnp.concatenate([jnp.array([INF]), row_tail])
        return new_row, new_row

    _, rows = jax.lax.scan(outer, row0, x)
    return jnp.concatenate([row0[None], rows], axis=0)


def dtw(x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal-cost monotonic path through ``x`` [N, M].

    Returns (text_indices, time_indices), matching the whisper ``dtw``
    contract used at reference mlx_whisper_optimized_final.py:199-206.
    """
    x = np.asarray(x, np.float32)
    n, m = x.shape
    # Bucket both dims so the jitted recursion compiles once per bucket
    # pair instead of once per (n_tokens, n_frames) — a per-segment
    # compile storm on long word-timestamp runs. Right/bottom padding is
    # sound by construction: cost[i, j] depends only on the top-left
    # submatrix, so cost[:n+1, :m+1] is identical to the unpadded result.
    n_pad = -(-n // 32) * 32
    m_pad = -(-m // 256) * 256
    if (n_pad, m_pad) != (n, m):
        xp = np.zeros((n_pad, m_pad), np.float32)
        xp[:n, :m] = x
    else:
        xp = x
    cost = np.asarray(_dtw_cost(jnp.asarray(xp)), np.float32)[: n + 1, : m + 1]

    i, j = n, m
    text_indices, time_indices = [], []
    while i > 0 or j > 0:
        text_indices.append(i - 1)
        time_indices.append(j - 1)
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            moves = (cost[i - 1, j - 1], cost[i - 1, j], cost[i, j - 1])
            k = int(np.argmin(moves))
            if k == 0:
                i, j = i - 1, j - 1
            elif k == 1:
                i -= 1
            else:
                j -= 1
    return np.array(text_indices[::-1]), np.array(time_indices[::-1])


import functools


@functools.partial(jax.jit, static_argnames=("width",))
def median_filter(x: jnp.ndarray, width: int = 7) -> jnp.ndarray:
    """Median filter along the last axis with edge reflection — the
    vectorized replacement for scipy.signal.medfilt (reference
    median_filter_fix.py:6-35)."""
    pad = width // 2
    padded = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect"
    )
    windows = jnp.stack(
        [padded[..., k : padded.shape[-1] - (width - 1 - k)] for k in range(width)],
        axis=-1,
    )
    return jnp.median(windows, axis=-1)
