"""Device-side chunking parity (audio/device_chunk.py).

The resident-waveform path (one upload → device VAD probs → device chunk
gather → mel) must reproduce the former host path exactly: same mels as
host-sliced `log_mel_batch`, same VAD probs/segments as the numpy pass.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import synth_speech
from whisperx_tpu.audio.constants import N_SAMPLES, SAMPLE_RATE
from whisperx_tpu.audio.device_chunk import (
    AUDIO_BUCKET,
    DeviceAudio,
    chunk_mels,
    upload_audio,
)
from whisperx_tpu.audio.mel import log_mel_batch


def _host_chunk_mels(audio: np.ndarray, chunks, n_mels: int) -> np.ndarray:
    """The former asr.py host slice loop, kept as the parity oracle."""
    padded = np.zeros((len(chunks), N_SAMPLES), np.float32)
    for i, ch in enumerate(chunks):
        s = int(ch["start"] * SAMPLE_RATE)
        e = min(int(ch["end"] * SAMPLE_RATE), len(audio))
        n = min(e - s, N_SAMPLES)
        padded[i, :n] = audio[s : s + n]
    return np.asarray(log_mel_batch(padded, n_mels))


def test_upload_audio_bucketed_and_lossless():
    audio = synth_speech(7.0)  # PCM-quantized? not necessarily — check both
    dev = upload_audio(audio)
    assert dev.length == len(audio)
    assert dev.data.shape[0] == AUDIO_BUCKET
    np.testing.assert_array_equal(np.asarray(dev.data[: len(audio)]), audio)
    assert float(jnp.abs(dev.data[len(audio) :]).max()) == 0.0
    # idempotent
    assert upload_audio(dev) is dev


def test_upload_audio_int16_exact_roundtrip():
    rng = np.random.default_rng(3)
    pcm = (
        rng.integers(-32768, 32768, size=SAMPLE_RATE).astype(np.float32) / 32768.0
    )
    dev = upload_audio(pcm)
    np.testing.assert_array_equal(np.asarray(dev.data[: len(pcm)]), pcm)


def test_chunk_mels_matches_host_slice_path():
    audio = synth_speech(70.0)
    chunks = [
        {"start": 0.0, "end": 28.3},
        {"start": 28.3, "end": 58.3},
        {"start": 58.3, "end": 70.0},  # short tail → zero-padded
    ]
    dev = upload_audio(audio)
    got = np.asarray(chunk_mels(dev, chunks, 80))
    want = _host_chunk_mels(audio, chunks, 80)
    assert got.shape == want.shape == (3, 3000, 80)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_chunk_mels_bucket_padding_rows_discarded():
    audio = synth_speech(40.0)
    chunks = [{"start": 1.0, "end": 29.0}, {"start": 29.0, "end": 40.0}, {"start": 0.0, "end": 30.0}]
    dev = upload_audio(audio)
    got = np.asarray(chunk_mels(dev, chunks, 80))  # n=3 → bucket 4
    want = _host_chunk_mels(audio, chunks, 80)
    assert got.shape[0] == 3
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_energy_vad_device_probs_match_host():
    from whisperx_tpu.vad.energy import EnergyVAD, _energy_probs_jit

    audio = synth_speech(23.0)
    v = EnergyVAD()
    p_host = v.speech_probs(audio)
    dev = upload_audio(audio)
    t = -(-len(audio) // 512)
    p_dev = np.asarray(_energy_probs_jit(dev.data, t))[:t]
    assert p_dev.shape == p_host.shape
    np.testing.assert_allclose(p_dev, p_host, atol=1e-4)


def test_energy_vad_device_segments_match_host():
    from whisperx_tpu.vad.energy import EnergyVAD

    audio = synth_speech(23.0)
    v = EnergyVAD()
    segs_h = v({"waveform": audio, "sample_rate": SAMPLE_RATE})
    dev = upload_audio(audio)
    segs_d = v(
        {"waveform": dev.data, "sample_rate": SAMPLE_RATE, "length": dev.length}
    )
    assert [(s.start, s.end) for s in segs_d] == [(s.start, s.end) for s in segs_h]
    assert len(segs_h) > 0


def test_silero_device_probs_match_host():
    from whisperx_tpu.vad.silero import SileroVAD

    audio = synth_speech(9.0)
    v = SileroVAD()  # random weights: prob parity is what matters
    p_host = v.speech_probs(audio)
    dev = upload_audio(audio)
    t = -(-len(audio) // 512)
    p_dev = np.asarray(v.speech_probs(dev.data))[:t]
    np.testing.assert_allclose(p_dev, p_host, atol=1e-5)


def test_pipeline_device_path_matches_host_path(nano_model):
    """End-to-end: transcribe() (device-resident path) vs the same decode
    driven by host-sliced mels — identical segments."""
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.vad import load_vad_model

    audio = synth_speech(12.0)
    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=load_vad_model("energy"),
        asr_options={"temperatures": (0.0,), "sample_len": 16},
        language="en",
    )
    result = pipe.transcribe(audio, batch_size=2)

    # oracle: identical chunks, host-sliced mels through the same decoder
    dev = upload_audio(audio)
    chunks = pipe._segment_with_vad(dev, 30)
    mels = jnp.asarray(_host_chunk_mels(audio, chunks, nano_model.dims.n_mels))
    segments = pipe._transcribe_chunks(
        None, chunks, batch_size=2, language="en", task="transcribe", mels=mels
    )
    assert result["segments"] == segments


def test_transcribe_many_pooled_mels(nano_model):
    """Cross-request coalescing without the virtual host timeline: each
    request's segments come back in its own time base."""
    from whisperx_tpu.asr import TranscriptionPipeline
    from whisperx_tpu.vad import load_vad_model

    a1 = synth_speech(8.0, seed=1)
    a2 = synth_speech(5.0, seed=2)
    pipe = TranscriptionPipeline(
        model=nano_model,
        vad_model=load_vad_model("energy"),
        asr_options={"temperatures": (0.0,), "sample_len": 12},
        language="en",
    )
    many = pipe.transcribe_many([a1, a2], batch_size=4)
    assert len(many) == 2
    # exact token identity vs solo transcribe is NOT asserted: pooling
    # changes the device batch composition, and bf16 tiling differences at
    # random-weight logit margins can flip argmax ties. What must hold:
    # every segment demuxes into its own request's local time base.
    for m, a in zip(many, (a1, a2)):
        assert m["language"] == "en"
        for seg in m["segments"]:
            assert 0 <= seg["start"] < seg["end"] <= len(a) / SAMPLE_RATE + 0.1


def test_chunk_mels_empty_list():
    """No chunks → empty [0, 3000, n_mels] result, not an IndexError."""
    from whisperx_tpu.audio.device_chunk import chunk_mels, upload_audio

    dev = upload_audio(np.zeros(16000, np.float32))
    out = chunk_mels(dev, [], 80)
    assert out.shape == (0, 3000, 80)


def test_pcm16_exact_accepts_full_scale_negative():
    """-32768 (a clipped full-scale negative PCM sample) is representable
    in int16 and must keep the lossless int16 upload path."""
    from whisperx_tpu.audio.device_chunk import _pcm16_exact

    a = np.array([-32768, -1, 0, 1, 32767], np.int16)
    f = a.astype(np.float32) / 32768.0
    kept = _pcm16_exact(f)
    assert kept is not None and kept.dtype == np.int16
    assert (kept == a).all()
    # a genuinely non-PCM float falls back
    assert _pcm16_exact(np.array([0.3333333], np.float32)) is None


def test_mulaw_compand_roundtrip_snr():
    """8-bit mu-law encode -> device expand: ~38 dB SNR on speech-level
    signal, monotone, and exact at 0/+-1 endpoints (round-5 upload-wall
    lever; VERDICT r4 Missing #5)."""
    from whisperx_tpu.audio.device_chunk import mulaw_encode, mulaw_expand

    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000.0
    x = (
        0.3 * np.sin(2 * np.pi * 440 * t)
        + 0.15 * np.sin(2 * np.pi * 1330 * t)
        + 0.02 * rng.standard_normal(len(t))
    ).astype(np.float32)
    x = np.clip(x, -1, 1)
    y = np.asarray(mulaw_expand(mulaw_encode(x)))
    snr = 10 * np.log10(float(np.mean(x**2)) / float(np.mean((x - y) ** 2)))
    assert snr > 33.0, snr
    ends = np.array([-1.0, 0.0, 1.0], np.float32)
    np.testing.assert_allclose(
        np.asarray(mulaw_expand(mulaw_encode(ends))), ends, atol=2e-3
    )


def test_pack12_roundtrip_exactness():
    """12-bit packing: quantization error bounded by one step (2^-11) and
    exact for values already on the 12-bit grid."""
    from whisperx_tpu.audio.device_chunk import pack12_encode, pack12_expand

    rng = np.random.default_rng(2)
    x = np.clip(rng.standard_normal(4096) * 0.3, -1, 1).astype(np.float32)
    y = np.asarray(pack12_expand(pack12_encode(x)))
    # half a step everywhere; one full step only at +1.0 (signed-range
    # asymmetry clips +2048 -> +2047, same as int16's +32767)
    assert np.abs(x - y).max() <= (1.0 / 2048.0) + 1e-7
    interior = np.abs(x) < 0.999
    assert np.abs(x - y)[interior].max() <= (0.5 / 2048.0) + 1e-7
    grid = np.clip(np.round(x * 2048.0), -2048, 2047) / 2048.0
    np.testing.assert_allclose(
        np.asarray(pack12_expand(pack12_encode(grid))), grid, atol=1e-7
    )


def _compand_mel_delta(monkeypatch, mode):
    from whisperx_tpu.audio.device_chunk import chunk_mels, upload_audio

    rng = np.random.default_rng(1)
    t = np.arange(16000 * 4) / 16000.0
    x = (0.3 * np.sin(2 * np.pi * 523 * t)).astype(np.float32)
    x += (0.01 * rng.standard_normal(len(x))).astype(np.float32)
    chunks = [{"start": 0.25, "end": 3.75}]

    mel_exact = np.asarray(chunk_mels(upload_audio(x), chunks, 80))
    monkeypatch.setenv("WHISPERX_TPU_UPLOAD_COMPAND", mode)
    mel_c = np.asarray(chunk_mels(upload_audio(x), chunks, 80))
    return mel_exact, mel_c


def test_mulaw_upload_mel_delta(monkeypatch):
    """μ-law upload: speech-carrying bins (within 2 decades of each
    frame's max) move < 0.05 in the log10 domain; quiet bins absorb the
    raised quantization noise floor (expected, and why μ-law stays
    opt-in pending the on-chip exactness A/B)."""
    mel_exact, mel_mu = _compand_mel_delta(monkeypatch, "mulaw")
    delta = np.abs(mel_exact - mel_mu)
    # whisper log-mels are (log10(power) clamped + 4) / 4: one decade is
    # 0.25 output units, so "within 2 decades of the frame max" is -0.5
    speech_bins = mel_exact > (mel_exact.max(axis=-1, keepdims=True) - 0.5)
    assert delta[speech_bins].max() < 0.05, delta[speech_bins].max()
    assert delta.max() < 1.5, delta.max()  # noise floor, bounded


def test_pack12_upload_mel_delta(monkeypatch):
    """12-bit packed upload: the WHOLE log-mel moves < 0.05 — the
    near-lossless byte-reduction option."""
    mel_exact, mel_p = _compand_mel_delta(monkeypatch, "pack12")
    assert np.abs(mel_exact - mel_p).max() < 0.05, np.abs(
        mel_exact - mel_p
    ).max()
