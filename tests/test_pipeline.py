"""End-to-end pipeline tests on the nano random model (CPU)."""

import numpy as np
import pytest

from tests.conftest import synth_speech
from whisperx_tpu.asr import TranscriptionPipeline, load_model
from whisperx_tpu.vad import EnergyVAD


@pytest.fixture(scope="module")
def pipeline(nano_model):
    return TranscriptionPipeline(
        model=nano_model,
        vad_model=EnergyVAD(),
        asr_options={
            "temperatures": (0.0,),
            "sample_len": 8,
            "log_prob_threshold": None,
            "compression_ratio_threshold": None,
            "no_speech_threshold": None,
        },
        language="en",
        batch_size=2,
    )


def test_transcribe_structure(pipeline):
    audio = np.concatenate(
        [np.zeros(8000, np.float32), synth_speech(4.0), np.zeros(8000, np.float32)]
    )
    result = pipeline.transcribe(audio, batch_size=2)
    assert result["language"] == "en"
    assert isinstance(result["segments"], list)
    for seg in result["segments"]:
        assert 0 <= seg["start"] < seg["end"] <= len(audio) / 16000 + 0.1
        assert isinstance(seg["text"], str)


def test_transcribe_silence_yields_no_segments(pipeline):
    result = pipeline.transcribe(np.zeros(32000, np.float32))
    assert result["segments"] == []


def test_transcribe_batches_pad_correctly(pipeline):
    """3 chunks with batch_size 2 → two padded batches, 3 results."""
    audio = synth_speech(12.0, seed=3)
    result = pipeline.transcribe(audio, batch_size=2, chunk_size=5)
    # segments bounded by audio duration
    for seg in result["segments"]:
        assert seg["end"] <= 12.5


def test_load_model_with_vad():
    pipe = load_model("test-nano", vad_method="energy", language="en")
    assert isinstance(pipe, TranscriptionPipeline)
    assert pipe.vad_model is not None


def test_load_model_quantized():
    pipe = load_model("test-nano", compute_type="int8", vad_method="none", language="en")
    assert pipe.model.name.endswith("int8")


def test_unified_pipeline_lazy(nano_model):
    from whisperx_tpu.pipeline import PipelineConfig, UnifiedPipeline

    cfg = PipelineConfig(
        model_name="test-nano",
        language="en",
        vad_method="energy",
        align=False,
        asr_options={"temperatures": (0.0,), "sample_len": 6},
        batch_size=2,
    )
    pipe = UnifiedPipeline(cfg)
    result = pipe(synth_speech(3.0))
    assert "segments" in result


def test_detect_language_api(pipeline):
    lang = pipeline.detect_language(synth_speech(2.0))
    assert isinstance(lang, str) and len(lang) >= 2
