"""Audio front-end tests: mel parity, pad/trim, WAV I/O."""

import os

import numpy as np
import pytest

from whisperx_tpu.audio import (
    HOP_LENGTH,
    N_FRAMES,
    N_SAMPLES,
    SAMPLE_RATE,
    load_audio,
    log_mel_spectrogram,
    mel_filters,
    pad_or_trim,
)
from whisperx_tpu.audio.io import save_wav

REF_FILTERS = "/root/reference/whisperx/assets/mel_filters.npz"


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filterbank_matches_librosa_gold(n_mels):
    if not os.path.exists(REF_FILTERS):
        pytest.skip("reference filterbank not available")
    gold = np.load(REF_FILTERS)[f"mel_{n_mels}"]
    ours = mel_filters(n_mels)
    np.testing.assert_allclose(ours, gold, atol=1e-7)


def test_log_mel_shape_and_range(speech_5s):
    mel = np.asarray(log_mel_spectrogram(speech_5s, 80))
    assert mel.shape == (80, len(speech_5s) // HOP_LENGTH)
    # normalized log-mel lives in [(max-8+4)/4, (max+4)/4] — roughly [-1.5, 2]
    assert mel.max() <= 2.5 and mel.min() >= -2.0
    # dynamic-range floor: max - min <= 8/4
    assert mel.max() - mel.min() <= 2.0 + 1e-5


def test_log_mel_30s_chunk_is_3000_frames():
    audio = np.zeros(N_SAMPLES, np.float32)
    mel = log_mel_spectrogram(audio, 80)
    assert mel.shape == (80, N_FRAMES)


def test_log_mel_batch_matches_single(speech_5s):
    from whisperx_tpu.audio.mel import log_mel_batch

    other = np.roll(speech_5s, 1000)
    batch = np.stack([speech_5s, other])
    mb = np.asarray(log_mel_batch(batch, 80))  # [N, T, n_mels]
    single0 = np.asarray(log_mel_spectrogram(speech_5s, 80)).T
    single1 = np.asarray(log_mel_spectrogram(other, 80)).T
    np.testing.assert_allclose(mb[0], single0, atol=5e-5)
    np.testing.assert_allclose(mb[1], single1, atol=5e-5)


def test_log_mel_batch_bucket_padding(speech_5s):
    """Odd batch counts go through the pow2-bucket path with padded rows
    computed and discarded."""
    from whisperx_tpu.audio.mel import log_mel_batch

    batch = np.stack([speech_5s, np.roll(speech_5s, 7), np.roll(speech_5s, 13)])
    mb = log_mel_batch(batch, 80)
    assert mb.shape[0] == 3
    ref = np.asarray(log_mel_spectrogram(batch[2], 80)).T
    np.testing.assert_allclose(np.asarray(mb[2]), ref, atol=5e-5)


def test_pad_or_trim():
    x = np.ones(100, np.float32)
    assert pad_or_trim(x, 50).shape == (50,)
    padded = pad_or_trim(x, 200)
    assert padded.shape == (200,)
    assert padded[150] == 0.0
    two_d = np.ones((3, 100), np.float32)
    assert pad_or_trim(two_d, 70).shape == (3, 70)


def test_wav_roundtrip(tmp_path, speech_5s):
    path = str(tmp_path / "clip.wav")
    save_wav(path, speech_5s)
    loaded = load_audio(path)
    assert loaded.shape == speech_5s.shape
    assert np.abs(loaded - speech_5s).max() < 1e-3  # 16-bit quantization


def test_wav_resample(tmp_path, speech_5s):
    path = str(tmp_path / "clip8k.wav")
    save_wav(path, speech_5s[::2], sr=8000)
    loaded = load_audio(path, sr=SAMPLE_RATE)
    assert abs(len(loaded) - len(speech_5s)) < 10
