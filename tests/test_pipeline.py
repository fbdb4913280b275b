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


def test_batched_subchunk_timestamps_and_words(nano_model, monkeypatch):
    """Batched mode must split each 30 s chunk's decoded tokens into
    timestamped sub-segments (seek-loop semantics) and honor
    word_timestamps (previously a silent no-op on this path)."""
    import whisperx_tpu.asr as asr_mod
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.decoding import get_tokenizer
    from whisperx_tpu.decoding.decode import DecodingResult
    from whisperx_tpu.vad.types import SpeechSegment

    tok = get_tokenizer(True, language="en")
    tb = tok.timestamp_begin
    # <|0.00|> hello <|1.00|><|1.00|> world <|2.00|>
    tokens = [tb, *tok.encode(" hello"), tb + 50, tb + 50, *tok.encode(" world"), tb + 100]

    def fake_decode(model, mel, opts, **kw):
        return [
            DecodingResult(
                audio_features=None,
                language="en",
                tokens=list(tokens),
                text="hello world",
                avg_logprob=-0.1,
                no_speech_prob=0.0,
                temperature=0.0,
                compression_ratio=1.0,
            )
            for _ in range(mel.shape[0])
        ]

    def fake_dispatch(model, mel, opts, **kw):
        return {"done": fake_decode(model, mel, opts, **kw)}

    monkeypatch.setattr(asr_mod, "decode_dispatch", fake_dispatch)

    class OneChunkVAD:
        vad_onset = 0.5
        vad_offset = 0.363

        def __call__(self, inp, max_speech_duration_s=30):
            return [SpeechSegment(start=2.0, end=8.0)]

    audio = np.zeros(16000 * 10, np.float32)

    def make_pipe(word_timestamps):
        return TranscriptionPipeline(
            model=nano_model,
            vad_model=OneChunkVAD(),
            asr_options={
                "temperatures": (0.0,),
                "no_speech_threshold": None,
                "log_prob_threshold": None,
                "compression_ratio_threshold": None,
                "word_timestamps": word_timestamps,
            },
            language="en",
            batch_size=2,
        )

    segs = make_pipe(False).transcribe(audio)["segments"]
    assert len(segs) == 2, segs
    # sub-chunk granularity: window-relative timestamps offset by chunk start
    assert segs[0]["start"] == 2.0 and segs[0]["end"] == 3.0
    assert segs[1]["start"] == 3.0 and segs[1]["end"] == 4.0
    assert segs[0]["text"] == "hello" and segs[1]["text"] == "world"

    # word_timestamps wired on the batched path (real teacher-forced pass;
    # whisper's edge heuristics may refine segment boundaries to word times)
    wsegs = make_pipe(True).transcribe(audio)["segments"]
    assert len(wsegs) == 2
    for seg in wsegs:
        assert seg["words"], seg
        for w in seg["words"]:
            assert set(w) >= {"word", "start", "end", "probability"}
            assert np.isfinite(w["start"]) and np.isfinite(w["end"])
    assert [w["word"] for w in wsegs[0]["words"]] == [" hello"]
    assert [w["word"] for w in wsegs[1]["words"]] == [" world"]


def test_warmup_compiles_serving_path(pipeline):
    """warmup() drives the real public path on synthetic speech: the
    energy VAD must find voiced chunks (else the decode program never
    compiles and warmup is a no-op) and the result must be structurally
    valid. Short duration keeps the CPU test fast; the default 65 s
    exists to compile multi-chunk steady-state shapes on a real chip."""
    from whisperx_tpu.asr import warmup_audio

    audio = warmup_audio(4.0)
    vad_chunks = pipeline.vad_model({"waveform": audio, "sample_rate": 16000})
    assert len(vad_chunks) > 0, "warmup signal must trip the VAD"
    result = pipeline.warmup(duration_s=4.0)
    assert isinstance(result.get("segments"), list)
    assert "language" in result
