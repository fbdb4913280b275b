"""suppress_numerals option tests (byte-fallback vocab: digits = bytes)."""

from whisperx_tpu.decoding import get_tokenizer
from whisperx_tpu.decoding.filters import build_suppress_list, numeral_tokens


def test_numeral_tokens_byte_vocab():
    tok = get_tokenizer(True, language="en", vocab_path="byte-fallback")
    nums = numeral_tokens(tok)
    # with the byte vocab, digit bytes 48..57 must be present
    assert set(range(48, 58)).issubset(nums)
    # memoized on the instance
    assert numeral_tokens(tok) is nums


def test_build_suppress_list_with_numerals():
    tok = get_tokenizer(True, language="en", vocab_path="byte-fallback")
    base = set(build_suppress_list(tok, "-1"))
    with_nums = set(build_suppress_list(tok, "-1", suppress_numerals=True))
    assert base < with_nums
    assert ord("5") in with_nums and ord("5") not in base
