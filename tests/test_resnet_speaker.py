"""ResNet34 speaker-embedding model tests (tiny random config)."""

import numpy as np

from tests.conftest import synth_speech
from whisperx_tpu.models.resnet_speaker.model import (
    TEST_CONFIG,
    ResNetSpeakerEmbedding,
)


def test_embedding_shape_and_norm():
    model = ResNetSpeakerEmbedding()
    windows = np.stack([synth_speech(2.0, seed=s) for s in range(3)])
    emb = model.embed(windows)
    assert emb.shape == (3, TEST_CONFIG.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)


def test_embedding_deterministic_and_input_sensitive():
    model = ResNetSpeakerEmbedding()
    a = model.embed(synth_speech(2.0, seed=0)[None])
    b = model.embed(synth_speech(2.0, seed=0)[None])
    c = model.embed((0.5 * synth_speech(2.0, seed=5))[None])
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert np.abs(a - c).max() > 1e-4


def test_diarization_pipeline_accepts_resnet_backend(speech_5s):
    from whisperx_tpu.diarize import DiarizationPipeline

    pipe = DiarizationPipeline(embedding_model=ResNetSpeakerEmbedding())
    df = pipe(speech_5s, max_speakers=2)
    assert set(["start", "end", "speaker"]).issubset(df.columns)
