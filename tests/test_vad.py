"""VAD subsystem tests: segmenter hysteresis, binarize min-cut, merging."""

import numpy as np

from tests.conftest import synth_speech
from whisperx_tpu.vad import (
    Binarize,
    EnergyVAD,
    SileroVAD,
    SpeechSegment,
    load_vad_model,
    merge_chunks,
    probs_to_speech_timestamps,
)


def test_probs_to_timestamps_basic():
    # 100 windows: speech in [20, 60)
    probs = np.zeros(100)
    probs[20:60] = 0.9
    segs = probs_to_speech_timestamps(probs, 100 * 512)
    assert len(segs) == 1
    s = segs[0]
    assert abs(s.start - 20 * 512 / 16000) < 0.05
    assert abs(s.end - 60 * 512 / 16000) < 0.05


def test_min_speech_duration_filters_blips():
    probs = np.zeros(100)
    probs[50:53] = 0.9  # 3 windows = 96 ms < 250 ms
    segs = probs_to_speech_timestamps(probs, 100 * 512)
    assert segs == []


def test_short_silence_bridged():
    probs = np.zeros(200)
    probs[20:80] = 0.9
    probs[82:140] = 0.9  # 2-window gap = 64 ms < 100 ms min silence
    segs = probs_to_speech_timestamps(probs, 200 * 512)
    assert len(segs) == 1


def test_max_speech_duration_splits():
    probs = np.full(40 * 16000 // 512, 0.9)  # 40 s of continuous speech
    segs = probs_to_speech_timestamps(
        probs, 40 * 16000, max_speech_duration_s=30.0
    )
    assert len(segs) >= 2
    assert all(s.duration <= 30.0 + 0.1 for s in segs)


def test_merge_chunks_packs_to_chunk_size():
    segs = [SpeechSegment(i * 5.0, i * 5.0 + 4.0) for i in range(10)]  # 50 s
    merged = merge_chunks(segs, 30.0)
    assert len(merged) == 2
    for m in merged:
        assert m["end"] - m["start"] <= 30.0
        assert m["segments"]
    # all input segments preserved
    assert sum(len(m["segments"]) for m in merged) == 10


def test_merge_chunks_empty():
    assert merge_chunks([], 30.0) == []


def test_binarize_hysteresis():
    t = np.arange(100) * 0.1
    scores = np.zeros(100)
    scores[30:60] = 0.8
    segs = Binarize(onset=0.5, offset=0.4)(scores, t)
    assert len(segs) == 1
    assert 2.9 <= segs[0].start <= 3.2
    assert 5.9 <= segs[0].end <= 6.1


def test_binarize_min_cut_max_duration():
    t = np.arange(400) * 0.1  # 40 s
    scores = np.full(400, 0.9)
    scores[200] = 0.55  # dip above offset: min-cut target
    segs = Binarize(onset=0.5, offset=0.4, max_duration=25.0)(scores, t)
    assert len(segs) >= 2
    assert all(s.duration <= 25.0 + 0.2 for s in segs)
    # the cut should land on the low-score frame
    assert any(abs(s.end - 20.0) < 1.0 for s in segs)


def test_energy_vad_finds_speech(speech_5s):
    vad = EnergyVAD()
    # embed speech between silence
    audio = np.concatenate(
        [np.zeros(16000, np.float32), speech_5s, np.zeros(16000, np.float32)]
    )
    segs = vad({"waveform": audio, "sample_rate": 16000})
    assert segs, "energy VAD found no speech"
    assert segs[0].start >= 0.5
    assert segs[-1].end <= len(audio) / 16000 - 0.4


def test_silero_jax_model_shapes():
    vad = SileroVAD()
    probs = vad.speech_probs(np.zeros(16000, np.float32))
    assert probs.shape == (16000 // 512 + 1,)
    assert np.all((probs >= 0) & (probs <= 1))


def test_load_vad_model_dispatch():
    assert isinstance(load_vad_model("energy"), EnergyVAD)
    v = load_vad_model("silero")
    assert v is not None
    h = load_vad_model("hybrid")
    assert h({"waveform": np.zeros(8000, np.float32), "sample_rate": 16000}) == []


def test_silero_without_checkpoint_warns_and_degrades(monkeypatch):
    """Missing Silero weights must fall back to the energy VAD LOUDLY."""
    import pytest

    from whisperx_tpu.vad import EnergyVAD, load_vad_model

    monkeypatch.delenv("WHISPERX_TPU_SILERO_CKPT", raising=False)
    with pytest.warns(UserWarning, match="energy"):
        m = load_vad_model("silero")
    assert isinstance(m, EnergyVAD)


def test_energy_vad_noise_only_returns_no_speech():
    """Purely relative percentile normalization used to classify the
    louder half of room tone as speech; the absolute floor stops that."""
    from whisperx_tpu.vad import EnergyVAD

    rng = np.random.default_rng(0)
    noise = (1e-4 * rng.standard_normal(16000 * 10)).astype(np.float32)
    vad = EnergyVAD()
    assert vad({"waveform": noise}) == []
    # loud speech still detected
    from tests.conftest import synth_speech

    assert vad({"waveform": synth_speech(5.0)}) != []


def test_energy_vad_device_path_pads_ragged_length():
    """Device waveform not divisible by 512 must pad, not crash."""
    import jax.numpy as jnp

    from tests.conftest import synth_speech
    from whisperx_tpu.vad import EnergyVAD

    audio = synth_speech(0.5)[:8000]  # 8000 % 512 != 0
    segs = EnergyVAD()({"waveform": jnp.asarray(audio), "length": 8000})
    host = EnergyVAD()({"waveform": audio})
    assert [(s.start, s.end) for s in segs] == [(s.start, s.end) for s in host]


def test_hybrid_vad_exposes_backend_capabilities():
    from whisperx_tpu.vad import HybridVAD

    vad = HybridVAD(vad_onset=0.4)
    assert vad.supports_device_audio is True
    assert vad.vad_onset == 0.4
