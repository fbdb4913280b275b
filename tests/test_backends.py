"""WhisperBackend contract tests (batched + sequential over the nano model)."""

import numpy as np
import pytest

from tests.conftest import synth_speech
from whisperx_tpu.backends import (
    BatchedJAXBackend,
    SequentialJAXBackend,
    WhisperBackend,
    load_backend,
)

ASR_OPTS = {
    "temperatures": (0.0,),
    "sample_len": 6,
    "log_prob_threshold": None,
    "compression_ratio_threshold": None,
    "no_speech_threshold": None,
}


@pytest.fixture(scope="module")
def batched():
    return BatchedJAXBackend(
        "test-nano", asr_options=ASR_OPTS, language="en", batch_size=2
    )


def test_load_backend_dispatch():
    assert isinstance(load_backend("batched", model="test-nano"), BatchedJAXBackend)
    assert isinstance(
        load_backend("sequential", model="test-nano"), SequentialJAXBackend
    )
    with pytest.raises(ValueError):
        load_backend("nope", model="test-nano")


def test_backend_properties(batched):
    assert isinstance(batched, WhisperBackend)
    assert batched.is_multilingual
    langs = batched.supported_languages
    assert "en" in langs and len(langs) == 99


def test_batched_transcribe(batched):
    result = batched.transcribe(synth_speech(2.0), batch_size=2)
    assert set(result) == {"segments", "language"}


def test_sequential_transcribe():
    backend = SequentialJAXBackend(
        "test-nano", asr_options=ASR_OPTS, language="en"
    )
    result = backend.transcribe(synth_speech(2.0))
    assert result["language"] == "en"
    for seg in result["segments"]:
        assert set(seg) >= {"start", "end", "text"}


def test_english_only_backend():
    b = BatchedJAXBackend("test-nano.en", asr_options=ASR_OPTS, language="en")
    assert not b.is_multilingual
    assert b.supported_languages == ["en"]


def test_pipeline_sequential_mode(nano_model):
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.vad import EnergyVAD

    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=EnergyVAD(),
        asr_options=ASR_OPTS,
        language="en",
        decode_mode="sequential",
        batch_size=2,
    )
    audio = synth_speech(4.0, seed=11)
    result = pipe.transcribe(audio)
    assert result["language"] == "en"
    for seg in result["segments"]:
        assert 0 <= seg["start"] <= seg["end"] <= 4.5


def test_sequential_pipeline_words_are_absolute(nano_model, monkeypatch):
    """Words from the sequential pipeline path must be shifted to
    stream-absolute times like their segments (regression: they were
    emitted chunk-relative, disagreeing with segment times by the
    chunk's start offset)."""
    import whisperx_tpu.decoding.transcribe as tr_mod
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.vad import EnergyVAD

    def fake_transcribe(model, audio, **kwargs):
        return {
            "segments": [
                {
                    "start": 0.5,
                    "end": 2.0,
                    "text": " hello world",
                    "words": [
                        {"word": " hello", "start": 0.5, "end": 1.0,
                         "probability": 0.9},
                        {"word": " world", "start": 1.2, "end": 2.0,
                         "probability": 0.9},
                    ],
                }
            ],
            "language": "en",
        }

    monkeypatch.setattr(tr_mod, "transcribe", fake_transcribe)
    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=EnergyVAD(),
        asr_options=ASR_OPTS | {"word_timestamps": True},
        language="en",
        decode_mode="sequential",
        batch_size=2,
    )
    chunks = [{"start": 5.0, "end": 9.0}]
    segs = pipe._transcribe_chunks_sequential(
        np.zeros(16000 * 10, np.float32), chunks,
        language="en", task="transcribe",
    )
    assert len(segs) == 1
    seg = segs[0]
    assert seg["start"] == 5.5 and seg["end"] == 7.0
    words = seg["words"]
    assert [w["start"] for w in words] == [5.5, 6.2]
    assert [w["end"] for w in words] == [6.0, 7.0]
    for w in words:  # words must lie inside their segment
        assert seg["start"] <= w["start"] <= w["end"] <= seg["end"]
