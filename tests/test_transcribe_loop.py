"""Sequential seek-loop transcribe() tests on the nano model."""

import numpy as np
import pytest

from tests.conftest import synth_speech
from whisperx_tpu.decoding.transcribe import transcribe


@pytest.fixture(scope="module")
def result(nano_model):
    audio = synth_speech(8.0, seed=7)
    return transcribe(
        nano_model,
        audio,
        language="en",
        temperature=0.0,
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
        sample_len=8,
    )


def test_result_contract(result):
    assert set(result) == {"text", "segments", "language"}
    assert result["language"] == "en"
    for seg in result["segments"]:
        assert set(seg) >= {
            "id", "seek", "start", "end", "text", "tokens",
            "temperature", "avg_logprob", "compression_ratio", "no_speech_prob",
        }
        assert seg["start"] <= seg["end"]


def test_segment_ids_sequential(result):
    ids = [s["id"] for s in result["segments"]]
    assert ids == list(range(len(ids)))


def test_seek_advances(result):
    # 8 s audio: a single 30 s window covers it; seek stays 0 for all
    assert all(s["seek"] >= 0 for s in result["segments"])


def test_temperature_fallback_ladder(nano_model):
    """With an impossible compression threshold every window climbs the
    temperature ladder and still returns."""
    audio = synth_speech(3.0, seed=8)
    result = transcribe(
        nano_model,
        audio,
        language="en",
        temperature=(0.0, 0.5),
        compression_ratio_threshold=-1.0,  # always "failed"
        logprob_threshold=None,
        no_speech_threshold=None,
        sample_len=6,
    )
    for seg in result["segments"]:
        assert seg["temperature"] == 0.5  # final rung


def test_no_speech_gating(nano_model):
    """A threshold of 0 marks everything as silence → no segments."""
    audio = synth_speech(3.0, seed=9)
    result = transcribe(
        nano_model,
        audio,
        language="en",
        temperature=0.0,
        no_speech_threshold=0.0,
        logprob_threshold=None,  # no confident-text override
        compression_ratio_threshold=None,
        sample_len=6,
    )
    assert result["segments"] == []


def test_initial_prompt_accepted(nano_model):
    audio = synth_speech(2.0, seed=10)
    result = transcribe(
        nano_model,
        audio,
        language="en",
        temperature=0.0,
        initial_prompt="some context",
        logprob_threshold=None,
        compression_ratio_threshold=None,
        no_speech_threshold=None,
        sample_len=4,
    )
    assert "segments" in result


def test_fallback_short_circuits_on_confident_silence(monkeypatch):
    """Upstream parity: no_speech_prob above threshold is NOT a quality
    failure — a silent window must decode once, not climb the whole
    temperature ladder re-sampling hallucinations."""
    import whisperx_tpu.decoding.transcribe as tr_mod
    from whisperx_tpu.decoding.decode import DecodingResult
    from whisperx_tpu.decoding.transcribe import _decode_with_fallback

    calls = []

    def fake_decode(model, mel, opts):
        calls.append(opts.temperature)
        return DecodingResult(
            audio_features=None, language="en", tokens=[], text="",
            avg_logprob=-2.0,  # fails the logprob threshold
            no_speech_prob=0.95,  # ...but it is confidently silence
            temperature=opts.temperature, compression_ratio=1.0,
        )

    monkeypatch.setattr(tr_mod, "decode", fake_decode)
    from whisperx_tpu.decoding import DecodingOptions

    result = _decode_with_fallback(
        object(), None, DecodingOptions(language="en"),
        temperatures=[0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
        thresholds=(2.4, -1.0, 0.6),
    )
    assert calls == [0.0]  # one decode, no ladder climb
    assert result.temperature == 0.0
