"""Golden-file writer parity: reference 30m.json → our writers must
reproduce the reference's 30m.{srt,vtt,tsv,txt} byte-for-byte.

These goldens were produced by the reference pipeline's writers from the
same segment list (SURVEY.md §4, gold-standard regression) — so they pin
our formatting (timestamp rendering, rounding, separators, stripping)
independently of any model weights. Skipped when /root/reference is absent.
"""

import io
import json
import os

import pytest

from whisperx_tpu.utils.writers import WriteSRT, WriteTSV, WriteTXT, WriteVTT

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF, "30m.json")),
    reason="reference gold artifacts not available",
)

OPTS = {"max_line_width": None, "max_line_count": None, "highlight_words": False}


@pytest.fixture(scope="module")
def gold_result():
    with open(os.path.join(REF, "30m.json"), encoding="utf-8") as f:
        return json.load(f)


def _render(writer_cls, result):
    buf = io.StringIO()
    writer_cls(".").write_result(result, file=buf, options=OPTS)
    return buf.getvalue()


def _gold(name):
    with open(os.path.join(REF, name), encoding="utf-8") as f:
        return f.read()


def test_srt_matches_gold(gold_result):
    assert _render(WriteSRT, gold_result) == _gold("30m.srt")


def test_vtt_matches_gold(gold_result):
    assert _render(WriteVTT, gold_result) == _gold("30m.vtt")


def test_tsv_matches_gold(gold_result):
    assert _render(WriteTSV, gold_result) == _gold("30m.tsv")


def test_txt_matches_gold(gold_result):
    assert _render(WriteTXT, gold_result) == _gold("30m.txt")


def test_gold_tokens_timestamp_layout(gold_result):
    """The gold segments' (large-v3) timestamp tokens must decode to the
    exact segment durations under OUR tokenizer layout — pinning
    timestamp_begin=50365 and the 0.02 s granularity on real data."""
    from whisperx_tpu.decoding.tokenizer import get_tokenizer

    tok = get_tokenizer(True, num_languages=100, language="en")
    assert tok.timestamp_begin == 50365
    checked = 0
    for seg in gold_result["segments"]:
        toks = seg["tokens"]
        if toks[0] >= tok.timestamp_begin and toks[-1] >= tok.timestamp_begin:
            dur_tokens = (toks[-1] - toks[0]) * 0.02
            dur_gold = seg["end"] - seg["start"]
            assert abs(dur_tokens - dur_gold) < 1e-6, seg["id"]
            checked += 1
    assert checked > 700  # nearly all 743 segments carry timestamp pairs


def test_gold_short_word_segments_shape():
    """short.json pins the aligned-output contract our align() emits."""
    with open(os.path.join(REF, "short.json"), encoding="utf-8") as f:
        gold = json.load(f)
    assert set(gold) == {"segments", "word_segments", "language"}
    for w in gold["word_segments"][:10]:
        assert set(w) >= {"word", "start", "end", "score"}
