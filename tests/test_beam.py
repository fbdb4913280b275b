"""Beam-search decode tests on the nano model."""

import jax.numpy as jnp
import numpy as np

from whisperx_tpu.decoding import DecodingOptions, decode, get_tokenizer
from whisperx_tpu.decoding.beam import rank_beams


def _mel(b=1, n_mels=80, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, 3000, n_mels)) * 0.1, jnp.float32)


def test_beam_decode_runs(nano_model):
    res = decode(
        nano_model,
        _mel()[0],
        DecodingOptions(language="en", sample_len=8, beam_size=3),
    )
    assert isinstance(res.tokens, list)
    assert len(res.tokens) <= 8
    assert np.isfinite(res.avg_logprob)


def test_beam_respects_timestamp_grammar(nano_model):
    tok = get_tokenizer(True, language="en")
    res = decode(
        nano_model,
        _mel(seed=1)[0],
        DecodingOptions(language="en", sample_len=12, beam_size=2),
    )
    if res.tokens:
        assert res.tokens[0] >= tok.timestamp_begin
        ts = [t for t in res.tokens if t >= tok.timestamp_begin]
        assert ts == sorted(ts)


def test_beam_batched(nano_model):
    res = decode(
        nano_model,
        _mel(b=2, seed=2),
        DecodingOptions(language="en", sample_len=6, beam_size=2),
    )
    assert len(res) == 2


def test_beam_size_one_equals_greedy(nano_model):
    """K=1 beam search is exactly greedy decoding."""
    mel = _mel(seed=3)[0]
    greedy = decode(
        nano_model, mel, DecodingOptions(language="en", sample_len=8)
    )
    beam = decode(
        nano_model,
        mel,
        DecodingOptions(language="en", sample_len=8, beam_size=1),
    )
    assert beam.tokens == greedy.tokens


def test_rank_beams_length_penalty():
    tokens = np.zeros((2, 8), np.int64)
    lengths = np.array([4, 8])
    scores = np.array([-2.0, -3.0])
    # score/length: -2/4 = -0.50 vs -3/8 = -0.375 → longer beam wins
    assert rank_beams(tokens, lengths, scores, None)[0] == 1
    # small alpha normalizes length weakly → higher raw score (shorter) wins
    assert rank_beams(tokens, lengths, scores, 0.5)[0] == 0


def test_beam_patience_collects_more_candidates(nano_model):
    """patience=2 collects round(K*patience) finished sequences before
    stopping (upstream BeamSearchDecoder semantics — was warned-ignored)."""
    from whisperx_tpu.decoding.decode import decode_dispatch, decode_finalize

    mel = _mel(seed=4)[0]
    opts = DecodingOptions(
        language="en", sample_len=16, beam_size=2, patience=2.0
    )
    handle = decode_dispatch(nano_model, mel, opts)
    assert "beam_device" in handle
    bank_toks, bank_lens, bank_scores, bank_count, *_ = handle["beam_device"]
    assert bank_toks.shape[1] == 4  # C = round(2 * 2.0)
    res = decode_finalize(handle)
    assert isinstance(res.tokens, list)
    assert np.isfinite(res.avg_logprob)


def test_bank_writes_upstream_cut():
    """EOT candidates ranked below the K-th surviving continuation are
    never banked (upstream BeamSearchDecoder stops recording once
    beam_size continuations are saved) — otherwise K low-scoring EOTs
    could fill the bank and end the search over better live beams."""
    import jax.numpy as jnp

    from whisperx_tpu.decoding.beam import _bank_writes

    # all K continuations outrank every EOT: nothing banks
    is_eot = jnp.array([[False] * 5 + [True] * 5])
    write, slot = _bank_writes(is_eot, jnp.array([0]), k=5, c=5)
    assert not bool(write.any())
    assert bool((slot == 5).all())  # every write routed to the dummy slot

    # EOTs above the cut bank densely; the one past K continuations drops
    is_eot = jnp.array([[True, False, True, False, True, False]])
    write, slot = _bank_writes(is_eot, jnp.array([0]), k=2, c=4)
    assert write[0].tolist() == [True, False, True, False, False, False]
    assert int(slot[0, 0]) == 0 and int(slot[0, 2]) == 1

    # existing bank_count offsets slots; capacity c drops the overflow
    is_eot = jnp.array([[True, True, False, False]])
    write, slot = _bank_writes(is_eot, jnp.array([3]), k=2, c=4)
    assert write[0].tolist() == [True, False, False, False]
    assert int(slot[0, 0]) == 3


def test_beam_banks_finished_and_keeps_exploring(nano_model):
    """A banked EOT no longer freezes a beam slot: the live beams keep
    exploring, and the final pick ranks over the bank."""
    from whisperx_tpu.decoding.decode import decode_dispatch

    mel = _mel(seed=5)[0]
    handle = decode_dispatch(
        nano_model, mel,
        DecodingOptions(language="en", sample_len=12, beam_size=3),
    )
    (bank_toks, bank_lens, bank_scores, bank_count,
     live_toks, live_scores, n_sampled, *_ ) = handle["beam_device"]
    bank_count = int(np.asarray(bank_count)[0])
    assert 0 <= bank_count <= 3
    # banked entries are internally consistent
    for s in range(bank_count):
        ln = int(np.asarray(bank_lens)[0, s])
        assert 0 <= ln <= 12
        assert np.isfinite(np.asarray(bank_scores)[0, s])
