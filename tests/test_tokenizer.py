"""Tokenizer layout + language tests (no downloaded vocab needed)."""

import pytest

from whisperx_tpu.decoding.tokenizer import get_tokenizer
from whisperx_tpu.utils.languages import LANGUAGE_CODES, LANGUAGES, normalize_language


def test_multilingual_special_layout():
    tok = get_tokenizer(True, num_languages=99, language="en", task="transcribe")
    assert tok.eot == 50257
    assert tok.sot == 50258
    assert tok.to_language_token("en") == 50259
    assert tok.translate == 50358
    assert tok.transcribe == 50359
    assert tok.sot_lm == 50360
    assert tok.sot_prev == 50361
    assert tok.no_speech == 50362
    assert tok.no_timestamps == 50363
    assert tok.timestamp_begin == 50364
    assert tok.sot_sequence == (50258, 50259, 50359)


def test_large_v3_layout_shifts_by_one():
    tok = get_tokenizer(True, num_languages=100, language="yue")
    assert tok.timestamp_begin == 50365
    assert tok.to_language_token("yue") == 50259 + 99


def test_english_only_layout():
    tok = get_tokenizer(False, language="en")
    assert tok.eot == 50256
    assert tok.sot == 50257
    assert tok.timestamp_begin == 50363
    assert tok.sot_sequence == (50257,)


def test_task_translate():
    tok = get_tokenizer(True, language="fr", task="translate")
    assert tok.sot_sequence[-1] == tok.translate


def test_timestamp_decoding():
    tok = get_tokenizer(True, language="en")
    s = tok.decode_with_timestamps([tok.timestamp_begin, tok.timestamp_begin + 150])
    assert "<|0.00|>" in s and "<|3.00|>" in s


def test_language_tables():
    assert len(LANGUAGE_CODES) == 100
    assert len(LANGUAGES) == 100
    assert normalize_language("FRENCH") == "fr"
    assert normalize_language("castilian") == "es"
    assert normalize_language(None) is None
    with pytest.raises(ValueError):
        normalize_language("klingon")


def test_byte_fallback_roundtrip():
    tok = get_tokenizer(True, language="en")
    text = "hello world"
    assert tok.decode(tok.encode(text)) == text


def test_non_speech_tokens_nonempty():
    tok = get_tokenizer(True, language="en")
    assert len(tok.non_speech_tokens) > 0
    assert all(t < tok.eot for t in tok.non_speech_tokens)


def test_language_normalized_on_construction():
    """'japanese' must store as 'ja' so CJK word splitting engages."""
    from whisperx_tpu.decoding import get_tokenizer

    tok = get_tokenizer(True, language="japanese")
    assert tok.language == "ja"


def test_partial_vocab_never_suppresses_space():
    """non_speech_tokens with the partial vocab must not contain the bare
    space token (regression: ' -'/' '' greedy-split to [space, ...] and
    t[0] banned token 220 while missing the real annotation tokens)."""
    from whisperx_tpu.decoding import get_tokenizer

    tok = get_tokenizer(True, language="en", vocab_path="gold-partial")
    space = tok.encode(" ")
    assert len(space) == 1
    assert space[0] not in tok.non_speech_tokens


def test_missing_vocab_path_raises():
    import pytest

    from whisperx_tpu.decoding import get_tokenizer

    with pytest.raises(FileNotFoundError):
        get_tokenizer(True, language="en", vocab_path="/nonexistent/v.tiktoken")


def test_partial_vocab_uncovered_byte_raises(tmp_path):
    """A user JSON vocab missing byte coverage must error, not hang."""
    import json

    import pytest

    from whisperx_tpu.decoding.tokenizer import PartialVocab

    p = tmp_path / "v.json"
    p.write_text(json.dumps({"0": "a"}))  # only 'a' covered
    v = PartialVocab(str(p), 50257)
    assert v.encode("a") == [0]
    with pytest.raises(ValueError):
        v.encode("b")
