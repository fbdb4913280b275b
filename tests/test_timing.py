"""Word-timing tests: DTW, median filter, find_alignment, punctuation merge."""

import jax.numpy as jnp
import numpy as np

from whisperx_tpu.decoding import get_tokenizer
from whisperx_tpu.timing import (
    WordTiming,
    add_word_timestamps,
    dtw,
    find_alignment,
    median_filter,
    merge_punctuations,
)


def test_dtw_identity_path():
    # strong diagonal: path should be near-diagonal
    n = 16
    x = np.ones((n, n), np.float32)
    np.fill_diagonal(x, 0.0)
    ti, fi = dtw(x)
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == n - 1
    # monotonic
    assert all(b - a >= 0 for a, b in zip(ti, ti[1:]))
    assert all(b - a >= 0 for a, b in zip(fi, fi[1:]))
    # mostly diagonal
    assert np.abs(ti - fi).max() <= 1


def test_dtw_rectangular():
    rng = np.random.default_rng(0)
    x = rng.random((5, 40)).astype(np.float32)
    ti, fi = dtw(x)
    assert ti[-1] == 4 and fi[-1] == 39


def test_median_filter_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.random((3, 50)).astype(np.float32)
    ours = np.asarray(median_filter(jnp.asarray(x), 7))
    # numpy oracle with reflect padding
    pad = 3
    padded = np.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    oracle = np.stack(
        [
            np.median(padded[:, i : i + 7], axis=1)
            for i in range(x.shape[1])
        ],
        axis=1,
    )
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_merge_punctuations():
    alignment = [
        WordTiming(" “", [1], 0.0, 0.1, 0.9),
        WordTiming("Hello", [2], 0.1, 0.5, 0.9),
        WordTiming(",", [3], 0.5, 0.6, 0.9),
        WordTiming(" world", [4], 0.6, 1.0, 0.9),
    ]
    merge_punctuations(alignment, "\"'“¿([{-", "\"'.。,，!！?？:：”)]}、")
    words = [w.word for w in alignment if w.word]
    assert words == [" “Hello,", " world"]


def test_find_alignment_structure(nano_model):
    tok = get_tokenizer(True, language="en", task="transcribe")
    text_tokens = tok.encode("hello world test")
    mel = jnp.zeros((3000, nano_model.dims.n_mels), jnp.float32)
    alignment = find_alignment(nano_model, tok, text_tokens, mel, 3000)
    assert isinstance(alignment, list)
    for w in alignment:
        assert w.start <= w.end
        assert 0.0 <= w.probability <= 1.0
    joined = "".join(w.word for w in alignment)
    assert "hello" in joined


def test_add_word_timestamps_inplace(nano_model):
    tok = get_tokenizer(True, language="en", task="transcribe")
    tokens = tok.encode("hello there friend")
    segments = [
        {
            "seek": 0,
            "start": 0.0,
            "end": 3.0,
            "text": "hello there friend",
            "tokens": tokens,
        }
    ]
    mel = jnp.zeros((3000, nano_model.dims.n_mels), jnp.float32)
    add_word_timestamps(
        segments=segments,
        model=nano_model,
        tokenizer=tok,
        mel=mel,
        num_frames=3000,
    )
    assert "words" in segments[0]
    for w in segments[0]["words"]:
        assert set(w) >= {"word", "start", "end", "probability"}
        assert w["start"] <= w["end"]
