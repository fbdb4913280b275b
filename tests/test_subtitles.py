"""SubtitlesProcessor and conjunction-table tests."""

from whisperx_tpu.utils.conjunctions import get_comma, get_conjunctions
from whisperx_tpu.utils.subtitles import SubtitlesProcessor, format_timestamp


def _words(text, start=0.0, dur=0.4):
    words = []
    t = start
    for w in text.split():
        words.append({"word": w, "start": round(t, 2), "end": round(t + dur, 2)})
        t += dur + 0.05
    return words


def test_conjunction_tables():
    assert "and" in get_conjunctions("en")
    assert "und" in get_conjunctions("de")
    assert get_conjunctions("xx") == set()
    assert get_comma("ja") == "、"
    assert get_comma("en") == ","


def test_format_timestamp_srt_vs_vtt():
    assert format_timestamp(1.5) == "00:00:01,500"
    assert format_timestamp(1.5, is_vtt=True) == "00:00:01.500"


def test_basic_splitting():
    text = "this is a fairly long sentence that should be split because it exceeds the line limit"
    seg = {"start": 0.0, "end": 8.0, "text": text, "words": _words(text)}
    proc = SubtitlesProcessor([seg], "en", max_line_length=30, min_char_length_splitter=15)
    subs = proc.process_segments(advanced_splitting=True)
    assert len(subs) >= 2
    for s in subs:
        assert s["text"].strip()
        assert s["start"] <= s["end"]
    # every word appears exactly once overall
    joined = " ".join(s["text"] for s in subs).split()
    assert joined == text.split()


def test_conjunction_split_point():
    text = "the quick brown fox jumps high and the lazy dog sleeps deeply tonight"
    seg = {"start": 0.0, "end": 7.0, "text": text, "words": _words(text)}
    proc = SubtitlesProcessor([seg], "en", max_line_length=60, min_char_length_splitter=20)
    subs = proc.process_segments()
    # "and" should start a fragment, not end one
    assert any(s["text"].strip().startswith("and") for s in subs)


def test_unaligned_word_estimation():
    words = _words("one two three")
    del words[1]["start"], words[1]["end"]
    seg = {"start": 0.0, "end": 2.0, "text": "one two three", "words": words}
    proc = SubtitlesProcessor([seg], "en")
    proc.process_segments()
    assert "start" in words[1] and "end" in words[1]
    assert words[1]["start"] <= words[1]["end"]


def test_complex_script_shorter_lines():
    proc = SubtitlesProcessor([], "ja")
    assert proc.max_line_length == 30
    assert proc.min_char_length_splitter == 20


def test_save_srt_and_vtt(tmp_path):
    text = "short caption"
    seg = {"start": 0.0, "end": 1.5, "text": text, "words": _words(text)}
    srt = tmp_path / "out.srt"
    n = SubtitlesProcessor([seg], "en").save(str(srt))
    assert n >= 1
    content = srt.read_text()
    assert "1\n" in content and "-->" in content

    vtt = tmp_path / "out.vtt"
    SubtitlesProcessor([seg], "en", is_vtt=True).save(str(vtt))
    assert vtt.read_text().startswith("WEBVTT")
