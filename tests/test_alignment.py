"""Forced-alignment tests: trellis vs reference-equivalent numpy DP,
backtracking, and end-to-end align() structure."""

import numpy as np
import pytest

from whisperx_tpu.alignment import (
    align,
    backtrack,
    backtrack_beam,
    get_trellis,
    load_align_model,
    merge_repeats,
)
from whisperx_tpu.alignment.trellis import wildcard_token_scores


def _reference_trellis(emission, tokens, blank_id=0):
    """Direct numpy port of reference alignment.py:387-404 semantics,
    used as the oracle for the lax.scan implementation."""
    num_frame, num_tokens = emission.shape[0], len(tokens)
    trellis = np.zeros((num_frame, num_tokens), np.float32)
    trellis[1:, 0] = np.cumsum(emission[1:, blank_id])
    trellis[0, 1:] = -np.inf
    trellis[-num_tokens + 1 :, 0] = np.inf
    wc = wildcard_token_scores(emission, np.asarray(tokens[1:]), blank_id)
    for t in range(num_frame - 1):
        trellis[t + 1, 1:] = np.maximum(
            trellis[t, 1:] + emission[t, blank_id],
            trellis[t, :-1] + wc[t],
        )
    return trellis


def _fake_emission(T=60, V=10, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((T, V)).astype(np.float32)
    e = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return e


def test_trellis_matches_reference_dp():
    emission = _fake_emission()
    tokens = [3, 5, 2, 7, 1]
    ours = get_trellis(emission, tokens)
    oracle = _reference_trellis(emission, tokens)
    finite = np.isfinite(oracle) & np.isfinite(ours)
    np.testing.assert_allclose(ours[finite], oracle[finite], atol=1e-4)
    np.testing.assert_array_equal(np.isinf(ours), np.isinf(oracle))


def test_trellis_numpy_matches_jax_scan():
    """The host-numpy default and the lax.scan variant are interchangeable."""
    emission = _fake_emission(T=90, seed=3)
    tokens = [3, -1, 5, 2, 7, 1]
    a = get_trellis(emission, tokens, use_jax=False)
    b = get_trellis(emission, tokens, use_jax=True)
    fin = np.isfinite(a) & np.isfinite(b)
    np.testing.assert_allclose(a[fin], b[fin], atol=1e-4)
    np.testing.assert_array_equal(np.isinf(a), np.isinf(b))


def test_trellis_with_wildcards():
    emission = _fake_emission(seed=1)
    tokens = [3, -1, 2, -1, 1]  # -1 = OOV wildcard
    ours = get_trellis(emission, tokens)
    oracle = _reference_trellis(emission, tokens)
    finite = np.isfinite(oracle) & np.isfinite(ours)
    np.testing.assert_allclose(ours[finite], oracle[finite], atol=1e-4)


def test_backtrack_produces_monotonic_path():
    emission = _fake_emission(T=80, seed=2)
    tokens = [4, 6, 2, 8]
    trellis = get_trellis(emission, tokens)
    for bt in (backtrack, lambda *a: backtrack_beam(*a, beam_width=2)):
        path = bt(trellis, emission, tokens, 0)
        assert path is not None
        tis = [p.token_index for p in path]
        assert tis[0] == 0 and tis[-1] == len(tokens) - 1
        assert all(b - a in (0, 1) for a, b in zip(tis, tis[1:]))
        times = [p.time_index for p in path]
        assert times == sorted(times)


def test_merge_repeats():
    from whisperx_tpu.alignment.trellis import Point

    path = [Point(0, 0, 0.9), Point(0, 1, 0.8), Point(1, 2, 0.7), Point(2, 3, 0.6)]
    segs = merge_repeats(path, "abc")
    assert [s.label for s in segs] == ["a", "b", "c"]
    assert segs[0].start == 0 and segs[0].end == 2
    assert abs(segs[0].score - 0.85) < 1e-9


def test_align_end_to_end_structure(speech_5s):
    model, metadata = load_align_model("en")
    transcript = [
        {"start": 0.2, "end": 2.4, "text": "hello world this is a test"},
        {"start": 2.6, "end": 4.6, "text": "another segment here"},
    ]
    result = align(transcript, model, metadata, speech_5s, "cpu")
    assert "segments" in result and "word_segments" in result
    assert len(result["word_segments"]) > 0
    for w in result["word_segments"]:
        assert "word" in w
        if "start" in w and "end" in w:
            assert 0 <= w["start"] <= w["end"] <= 5.5
    # words per segment preserved in order
    joined = " ".join(w["word"] for w in result["segments"][0]["words"])
    assert "hello" in joined


def test_align_char_alignments(speech_5s):
    model, metadata = load_align_model("en")
    transcript = [{"start": 0.0, "end": 2.0, "text": "abc def"}]
    result = align(
        transcript, model, metadata, speech_5s, "cpu", return_char_alignments=True
    )
    seg = result["segments"][0]
    assert seg.get("chars")
    assert all("char" in c for c in seg["chars"])


def test_align_oov_segment_degrades_gracefully(speech_5s):
    model, metadata = load_align_model("en")
    transcript = [{"start": 0.0, "end": 1.0, "text": "€€€ ☃☃"}]
    result = align(transcript, model, metadata, speech_5s, "cpu")
    assert isinstance(result["segments"], list)


def test_align_start_beyond_audio(speech_5s):
    model, metadata = load_align_model("en")
    transcript = [{"start": 99.0, "end": 100.0, "text": "too late"}]
    result = align(transcript, model, metadata, speech_5s, "cpu")
    assert result["segments"][0]["words"] == []


def test_random_weight_fallback_is_flagged():
    """load_align_model marks random-weight aligners so the CLI can skip
    alignment instead of emitting meaningless timings."""
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        _, metadata = load_align_model("en")
    assert metadata["random_weights"] is True


def test_align_refuses_random_weights_by_default(speech_5s, monkeypatch):
    """Without the env escape hatch, align() with a random-weight model
    returns the transcript UNALIGNED (empty words) — the guard now lives
    at the alignment layer so every entry point (CLI reloads,
    UnifiedPipeline, library callers) inherits it."""
    monkeypatch.delenv("WHISPERX_TPU_ALLOW_RANDOM_ALIGN", raising=False)
    model, metadata = load_align_model("en")
    assert metadata["random_weights"] is True
    transcript = [{"start": 0.5, "end": 2.0, "text": "hello there"}]
    import warnings as _w

    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        result = align(transcript, model, metadata, speech_5s, "cpu")
    assert result["segments"][0]["words"] == []
    assert result["word_segments"] == []
    assert any("RANDOM weights" in str(r.message) for r in rec)
