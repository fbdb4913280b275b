"""Writer format tests: txt/srt/vtt/tsv/json/aud + subtitle line breaking."""

import io
import json

from whisperx_tpu.utils import format_timestamp, get_writer
from whisperx_tpu.utils.writers import (
    WriteAudacity,
    WriteJSON,
    WriteSRT,
    WriteTSV,
    WriteTXT,
    WriteVTT,
)

RESULT = {
    "language": "en",
    "segments": [
        {
            "start": 0.0,
            "end": 2.5,
            "text": " Hello world.",
            "words": [
                {"word": "Hello", "start": 0.1, "end": 0.6, "score": 0.9},
                {"word": "world.", "start": 0.8, "end": 1.4, "score": 0.8},
            ],
        },
        {
            "start": 3.0,
            "end": 5.0,
            "text": " Second segment here.",
            "words": [
                {"word": "Second", "start": 3.1, "end": 3.5, "score": 0.9},
                {"word": "segment", "start": 3.6, "end": 4.0, "score": 0.9},
                {"word": "here.", "start": 4.2, "end": 4.8, "score": 0.9},
            ],
        },
    ],
}

OPTS = {"max_line_width": None, "max_line_count": None, "highlight_words": False}


def _render(writer_cls, result=RESULT, options=OPTS):
    buf = io.StringIO()
    writer_cls(".").write_result(result, file=buf, options=options)
    return buf.getvalue()


def test_format_timestamp():
    assert format_timestamp(0.0) == "00:00.000"
    assert format_timestamp(3661.5, always_include_hours=True) == "01:01:01.500"
    assert format_timestamp(1.5, decimal_marker=",") == "00:01,500"


def test_txt_writer():
    out = _render(WriteTXT)
    assert out == "Hello world.\nSecond segment here.\n"


def test_txt_writer_with_speakers():
    result = {
        "segments": [
            {"start": 0, "end": 1, "text": " hi", "speaker": "SPEAKER_00"}
        ]
    }
    assert _render(WriteTXT, result) == "[SPEAKER_00]: hi\n"


def test_srt_writer():
    out = _render(WriteSRT)
    lines = out.strip().split("\n")
    assert lines[0] == "1"
    assert "-->" in lines[1]
    assert "," in lines[1]  # SRT decimal marker
    assert lines[1].startswith("00:00:00,000")
    assert "Hello world." in out
    assert "\n2\n" in out


def test_vtt_writer():
    out = _render(WriteVTT)
    assert out.startswith("WEBVTT\n")
    assert "00:00.000 --> " in out


def test_tsv_writer_milliseconds():
    out = _render(WriteTSV)
    lines = out.strip().split("\n")
    assert lines[0] == "start\tend\ttext"
    assert lines[1].split("\t")[:2] == ["0", "2500"]


def test_json_writer_roundtrip():
    out = _render(WriteJSON)
    parsed = json.loads(out)
    assert parsed["segments"][0]["words"][0]["word"] == "Hello"


def test_aud_writer():
    out = _render(WriteAudacity)
    assert out.startswith("0.0\t2.5\tHello world.")


def test_highlight_words_underlines():
    opts = {**OPTS, "highlight_words": True}
    out = _render(WriteSRT, RESULT, opts)
    assert "<u>Hello</u>" in out
    assert "<u>world.</u>" in out


def test_line_width_breaking():
    opts = {"max_line_width": 10, "max_line_count": 2, "highlight_words": False}
    out = _render(WriteSRT, RESULT, opts)
    # with width 10 the two words of segment 1 won't share a line
    first_block = out.split("\n\n")[0]
    assert "\n" in first_block.split("\n", 2)[2]


def test_get_writer_all(tmp_path):
    writer = get_writer("all", str(tmp_path))
    writer(RESULT, "audio.wav", OPTS)
    for ext in ("txt", "srt", "vtt", "tsv", "json"):
        assert (tmp_path / f"audio.{ext}").exists()


def test_get_writer_single(tmp_path):
    writer = get_writer("srt", str(tmp_path))
    writer(RESULT, "/some/path/clip.mp3", OPTS)
    assert (tmp_path / "clip.srt").exists()


def test_rttm_writer_merges_and_skips():
    from whisperx_tpu.utils.writers import WriteRTTM

    result = {
        "segments": [
            {"start": 0.0, "end": 2.5, "text": "a", "speaker": "SPEAKER_00"},
            # abuts previous, same speaker -> one merged turn
            {"start": 2.5, "end": 4.0, "text": "b", "speaker": "SPEAKER_00"},
            {"start": 5.0, "end": 6.0, "text": "c", "speaker": "SPEAKER_01"},
            {"start": 7.0, "end": 8.0, "text": "d"},  # no speaker: skipped
        ]
    }
    out = _render(WriteRTTM, result)
    lines = out.strip().splitlines()
    assert lines == [
        "SPEAKER audio 1 0.000 4.000 <NA> <NA> SPEAKER_00 <NA> <NA>",
        "SPEAKER audio 1 5.000 1.000 <NA> <NA> SPEAKER_01 <NA> <NA>",
    ]


def test_rttm_writer_file_uri_and_der_roundtrip(tmp_path):
    result = {
        "segments": [
            {"start": 0.0, "end": 2.0, "text": "a", "speaker": "SPEAKER_00"},
            {"start": 2.0, "end": 3.0, "text": "b", "speaker": "SPEAKER_01"},
        ]
    }
    writer = get_writer("rttm", str(tmp_path))
    writer(result, "/some/dir/meeting.wav", OPTS)
    path = tmp_path / "meeting.rttm"
    assert path.exists()
    assert "SPEAKER meeting 1" in path.read_text()

    from whisperx_tpu.utils.der import diarization_error_rate, load_rttm

    turns = load_rttm(str(path))
    ref = [(0.0, 2.0, "A"), (2.0, 3.0, "B")]
    assert diarization_error_rate(ref, turns, collar=0.0)["der"] == 0.0


def test_get_writer_all_excludes_optional(tmp_path):
    """'all' fans out the standard formats only; aud/rttm stay opt-in."""
    writer = get_writer("all", str(tmp_path))
    writer(RESULT, "audio.wav", OPTS)
    assert not (tmp_path / "audio.rttm").exists()
    assert not (tmp_path / "audio.aud").exists()
