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


def test_native_rejects_zero_channel_wav(tmp_path):
    """A fmt chunk with channels=0 must return an error, not SIGFPE."""
    import struct

    from whisperx_tpu.native import decode_wav_file

    fmt = struct.pack("<HHIIHH", 1, 0, 16000, 0, 0, 16)  # channels=0
    data = b"\x00\x00" * 100
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    path = tmp_path / "bad.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    with pytest.raises(Exception):
        decode_wav_file(str(path), 16000)


def test_native_rejects_oversized_data_chunk(tmp_path):
    """A data chunk declaring more bytes than the file holds must fail
    cleanly instead of attempting a huge allocation."""
    import struct

    from whisperx_tpu.native import decode_wav_file

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    riff = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0x7FFFFFFF) + b"\x00\x00"
    )
    path = tmp_path / "trunc.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    with pytest.raises(Exception):
        decode_wav_file(str(path), 16000)
