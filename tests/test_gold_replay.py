"""Seek/timestamp parity against the reference's gold artifact.

`/root/reference/30m.json` carries 743 segments of real large-v3 output
(tokens, seek, start, end) produced by the reference pipeline: VAD chunks
transcribed independently, each via the Whisper seek loop, chunk offset
added to the times. No vocabulary is needed to replay the *arithmetic*:
reconstruct each window's decoded token stream by concatenating its
segments' token lists, push it through
``split_timestamp_segments`` (whisperx_tpu/decoding/transcribe.py), and
require the resulting segmentation — token partition, start, end — to
reproduce the gold fields exactly, plus the seek-advance formula for the
chunks that needed more than one 30 s window.
"""

import json
import pathlib

import pytest

from whisperx_tpu.decoding.transcribe import split_timestamp_segments

GOLD = pathlib.Path("/root/reference/30m.json")
TSB = 50365  # <|0.00|> in the multilingual large-v3 layout
EOT = 50257
TIME_PER_FRAME = 0.01  # HOP_LENGTH / SAMPLE_RATE
N_FRAMES = 3000

pytestmark = pytest.mark.skipif(
    not GOLD.exists(), reason="gold artifact not mounted"
)


def _chunks():
    """Group gold segments into per-VAD-chunk runs (id resets to 0)."""
    segs = json.load(GOLD.open())["segments"]
    chunks, cur = [], []
    for s in segs:
        if cur and s["id"] <= cur[-1]["id"]:
            chunks.append(cur)
            cur = []
        cur.append(s)
    chunks.append(cur)
    return chunks


def _windows(chunk):
    """Split one chunk's segments into seek-loop windows (same seek)."""
    wins, cur = [], []
    for s in chunk:
        if cur and s["seek"] != cur[-1]["seek"]:
            wins.append(cur)
            cur = []
        cur.append(s)
    wins.append(cur)
    return wins


def test_tokenizer_layout_matches_gold():
    """The special-token layout our tokenizer pins must be the one the gold
    tokens were produced with: timestamps in [50365, 50365+1500], text
    below EOT=50257."""
    from whisperx_tpu.decoding.tokenizer import get_tokenizer

    tok = get_tokenizer(True, num_languages=100)
    assert tok.timestamp_begin == TSB
    assert tok.eot == EOT
    segs = json.load(GOLD.open())["segments"]
    for s in segs:
        t = s["tokens"]
        assert t[0] >= TSB and t[0] <= TSB + 1500
        assert t[-1] >= TSB and t[-1] <= TSB + 1500
        assert all(x < EOT for x in t[1:-1] if x < TSB)


def test_replay_gold_segmentation():
    """All 743 gold segments: replaying each window's token stream through
    split_timestamp_segments reproduces (tokens, start, end) exactly."""
    n_checked = 0
    for chunk in _chunks():
        first = chunk[0]
        assert first["seek"] == 0
        # chunk offset: gold start minus the in-window token time
        offset = first["start"] - (first["tokens"][0] - TSB) * 0.02
        for win in _windows(chunk):
            seek = win[0]["seek"]
            stream = [t for s in win for t in s["tokens"]]
            raw, _advance, _single = split_timestamp_segments(
                stream, timestamp_begin=TSB, segment_size=N_FRAMES
            )
            assert len(raw) == len(win), (seek, len(raw), len(win))
            time_offset = offset + seek * TIME_PER_FRAME
            for (rs, re_, rtoks), gold in zip(raw, win):
                assert rtoks == gold["tokens"]
                assert abs(time_offset + rs - gold["start"]) < 1e-6
                assert abs(time_offset + re_ - gold["end"]) < 1e-6
                n_checked += 1
    assert n_checked == 743, n_checked


def test_replay_gold_seek_advance():
    """Multi-window chunks: the next window's gold seek equals
    seek + (last closing timestamp − timestamp_begin) × input_stride —
    the non-single-ending advance rule."""
    n_multi = 0
    for chunk in _chunks():
        wins = _windows(chunk)
        for prev, nxt in zip(wins, wins[1:]):
            last_close = prev[-1]["tokens"][-1]
            expect = prev[0]["seek"] + (last_close - TSB) * 2
            assert nxt[0]["seek"] == expect, (prev[0]["seek"], nxt[0]["seek"])
            n_multi += 1
    assert n_multi >= 3  # the gold file contains several 2-window chunks
