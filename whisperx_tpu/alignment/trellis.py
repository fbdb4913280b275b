"""CTC trellis forced alignment: jitted forward DP + host backtrack.

Semantics parity with reference alignment.py:387-579 (get_trellis with
wildcard emissions, greedy backtrack, width-limited beam backtrack,
merge_repeats). The O(T) sequential trellis fill — a Python loop over torch
rows in the reference (alignment.py:396-403) — is a single ``lax.scan``
here (SURVEY.md §3.5); backtracking stays on host (cheap, data-dependent).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = float("-inf")


@dataclass
class Point:
    token_index: int
    time_index: int
    score: float


@dataclass
class CharSegment:
    label: str
    start: int
    end: int
    score: float

    @property
    def length(self) -> int:
        return self.end - self.start


@jax.jit
def _trellis_scan(
    blank: jnp.ndarray, token_emission: jnp.ndarray, col0: jnp.ndarray
) -> jnp.ndarray:
    """blank: [T] blank log-probs; token_emission: [T, N-1] per-frame scores
    for tokens[1:] (wildcards resolved); col0: [T] precomputed first column
    (cumulative blank with the reference's +inf tail). Returns trellis [T, N].
    """
    n_tokens = token_emission.shape[1] + 1

    row0 = jnp.full((n_tokens,), NEG_INF).at[0].set(col0[0])

    def step(prev, inputs):
        blank_t, tok_t, col0_next = inputs
        stay = prev[1:] + blank_t
        change = prev[:-1] + tok_t
        new = jnp.concatenate([col0_next[None], jnp.maximum(stay, change)])
        return new, new

    _, rows = jax.lax.scan(
        step, row0, (blank[:-1], token_emission[:-1], col0[1:])
    )
    return jnp.concatenate([row0[None], rows], axis=0)


def wildcard_token_scores(
    emission: np.ndarray, tokens: np.ndarray, blank_id: int = 0
) -> np.ndarray:
    """Per-frame emission scores for each token; wildcard (-1) tokens take
    the max non-blank score (reference get_wildcard_emission,
    alignment.py:407-437). emission: [T, V] → [T, N]."""
    # int64 even when empty (a 1-char segment has no tokens[1:] — a plain
    # asarray would be float64 and break the fancy index)
    tokens = np.asarray(tokens, dtype=np.int64)
    safe = np.clip(tokens, 0, None)
    scores = emission[:, safe]  # [T, N]
    masked = emission.copy()
    masked[:, blank_id] = NEG_INF
    max_valid = masked.max(axis=1)  # [T]
    return np.where(tokens[None, :] == -1, max_valid[:, None], scores)


def get_trellis(
    emission: np.ndarray,
    tokens: List[int],
    blank_id: int = 0,
    use_jax: bool = False,
) -> np.ndarray:
    """Trellis [T, N] matching reference alignment.py:387-404 exactly,
    including the +inf guard forcing the path to finish all tokens.

    Default path is vectorized numpy: every segment has a distinct
    (frames, tokens) shape, so the jitted scan would recompile per segment
    (seconds each) for a DP that takes milliseconds on host. ``use_jax``
    selects the ``lax.scan`` version for fixed-shape/batch workloads.
    """
    emission = np.asarray(emission, np.float32)
    tokens = list(tokens)
    num_frames = emission.shape[0]
    num_tokens = len(tokens)
    blank = emission[:, blank_id]
    # column 0: cumulative blank score, with the +inf tail the reference
    # installs BEFORE the DP (alignment.py:392-394) so it floods the
    # upper-right triangle and forces the path to finish every token.
    col0 = np.concatenate([[0.0], np.cumsum(blank[1:])]).astype(np.float32)
    col0[num_frames - num_tokens + 1 :] = np.float32(np.inf)
    tok_scores = wildcard_token_scores(emission, np.asarray(tokens[1:]), blank_id)

    if use_jax:
        return np.asarray(
            _trellis_scan(
                jnp.asarray(blank), jnp.asarray(tok_scores), jnp.asarray(col0)
            ),
            np.float32,
        )

    trellis = np.empty((num_frames, num_tokens), np.float32)
    trellis[:, 0] = col0
    trellis[0, 1:] = NEG_INF
    row = trellis[0]
    for t in range(num_frames - 1):
        new = np.empty(num_tokens, np.float32)
        new[0] = col0[t + 1]
        np.maximum(row[1:] + blank[t], row[:-1] + tok_scores[t], out=new[1:])
        trellis[t + 1] = new
        row = new
    return trellis


def _token_frame_score(
    emission: np.ndarray, t: int, token: int, blank_id: int
) -> float:
    if token == -1:
        masked = emission[t].copy()
        masked[blank_id] = NEG_INF
        return float(masked.max())
    return float(emission[t, token])


def backtrack(
    trellis: np.ndarray,
    emission: np.ndarray,
    tokens: List[int],
    blank_id: int = 0,
) -> Optional[List[Point]]:
    """Greedy backtrack (reference alignment.py:447-481)."""
    t, j = trellis.shape[0] - 1, trellis.shape[1] - 1
    path = [Point(j, t, float(np.exp(emission[t, blank_id])))]
    while j > 0:
        assert t > 0
        p_stay = float(emission[t - 1, blank_id])
        p_change = _token_frame_score(emission, t - 1, tokens[j], blank_id)
        stayed = trellis[t - 1, j] + p_stay
        changed = trellis[t - 1, j - 1] + p_change
        t -= 1
        if changed > stayed:
            j -= 1
        prob = math.exp(p_change if changed > stayed else p_stay)
        path.append(Point(j, t, prob))
    while t > 0:
        prob = float(np.exp(emission[t - 1, blank_id]))
        path.append(Point(j, t - 1, prob))
        t -= 1
    return path[::-1]


@dataclass
class _BeamState:
    token_index: int
    time_index: int
    score: float
    path: List[Point]


def backtrack_beam(
    trellis: np.ndarray,
    emission: np.ndarray,
    tokens: List[int],
    blank_id: int = 0,
    beam_width: int = 2,
) -> Optional[List[Point]]:
    """Width-limited beam backtrack (reference alignment.py:500-579)."""
    t_max, j_max = trellis.shape[0] - 1, trellis.shape[1] - 1
    beams = [
        _BeamState(
            j_max,
            t_max,
            float(trellis[t_max, j_max]),
            [Point(j_max, t_max, float(np.exp(emission[t_max, blank_id])))],
        )
    ]

    while beams and beams[0].token_index > 0:
        next_beams = []
        for beam in beams:
            t, j = beam.time_index, beam.token_index
            if t <= 0:
                continue
            p_stay = float(emission[t - 1, blank_id])
            p_change = _token_frame_score(emission, t - 1, tokens[j], blank_id)
            stay_score = float(trellis[t - 1, j])
            change_score = float(trellis[t - 1, j - 1]) if j > 0 else NEG_INF

            if not math.isinf(stay_score):
                next_beams.append(
                    _BeamState(
                        j,
                        t - 1,
                        stay_score,
                        beam.path + [Point(j, t - 1, math.exp(p_stay))],
                    )
                )
            if j > 0 and not math.isinf(change_score):
                next_beams.append(
                    _BeamState(
                        j - 1,
                        t - 1,
                        change_score,
                        beam.path + [Point(j - 1, t - 1, math.exp(p_change))],
                    )
                )
        beams = sorted(next_beams, key=lambda b: b.score, reverse=True)[:beam_width]
        if not beams:
            break

    if not beams:
        return None
    best = beams[0]
    t, j = best.time_index, best.token_index
    while t > 0:
        best.path.append(Point(j, t - 1, float(np.exp(emission[t - 1, blank_id]))))
        t -= 1
    return best.path[::-1]


def merge_repeats(path: List[Point], transcript: str) -> List[CharSegment]:
    """Collapse repeated token frames to char segments (reference
    alignment.py:597-613)."""
    i1, i2 = 0, 0
    segments = []
    while i1 < len(path):
        while i2 < len(path) and path[i1].token_index == path[i2].token_index:
            i2 += 1
        score = sum(path[k].score for k in range(i1, i2)) / (i2 - i1)
        segments.append(
            CharSegment(
                transcript[path[i1].token_index],
                path[i1].time_index,
                path[i2 - 1].time_index + 1,
                score,
            )
        )
        i1 = i2
    return segments
