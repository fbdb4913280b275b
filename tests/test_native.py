"""Native C++ audio library tests (skipped if g++ is unavailable)."""

import shutil
import wave

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


def _write_wav(path, sig, sr, channels=1, sampwidth=2):
    pcm = (np.clip(sig, -1, 1) * 32767).astype(np.int16)
    if channels == 2:
        pcm = np.stack([pcm, pcm], 1).reshape(-1)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def test_native_decode_and_resample(tmp_path):
    from whisperx_tpu.native import decode_wav_file

    sr = 44100
    t = np.arange(sr) / sr
    sig = 0.5 * np.sin(2 * np.pi * 1000 * t)
    path = tmp_path / "sine.wav"
    _write_wav(path, sig, sr, channels=2)

    out = decode_wav_file(str(path), 16000)
    assert abs(len(out) - 16000) <= 2
    # the tone must survive the downmix + resample
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * 16000 / len(out)
    assert abs(peak_hz - 1000) < 5
    # energy preserved
    assert abs(np.sqrt((out**2).mean()) - 0.5 / np.sqrt(2)) < 0.01


def test_native_resample_identity():
    from whisperx_tpu.native import resample

    sig = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    assert np.array_equal(resample(sig, 16000, 16000), sig)


def test_native_decode_error_on_garbage(tmp_path):
    from whisperx_tpu.native import decode_wav_file

    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")
    with pytest.raises(RuntimeError):
        decode_wav_file(str(bad), 16000)


def test_load_audio_uses_native_for_wav(tmp_path, monkeypatch):
    """audio.load_audio routes WAVs through the native decoder when ffmpeg
    is absent."""
    import whisperx_tpu.audio.io as io_mod

    monkeypatch.setattr(io_mod, "_FFMPEG", None)
    sig = 0.25 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
    path = tmp_path / "a.wav"
    _write_wav(path, sig, 16000)
    out = io_mod.load_audio(str(path))
    assert len(out) == 16000
    assert np.abs(out - sig).max() < 1e-3
