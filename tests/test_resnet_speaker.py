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


def test_wespeaker_converter_roundtrip(tmp_path):
    import pytest

    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    def bn(prefix, c, sd):
        sd[f"{prefix}.weight"] = t(c)
        sd[f"{prefix}.bias"] = t(c)
        sd[f"{prefix}.running_mean"] = t(c)
        sd[f"{prefix}.running_var"] = torch.abs(t(c)) + 1.0

    channels = [4, 8, 8, 8]
    sd = {}
    sd["conv1.weight"] = t(channels[0], 1, 3, 3)
    bn("bn1", channels[0], sd)
    c_in = channels[0]
    for stage, c_out in enumerate(channels, start=1):
        sd[f"layer{stage}.0.conv1.weight"] = t(c_out, c_in, 3, 3)
        bn(f"layer{stage}.0.bn1", c_out, sd)
        sd[f"layer{stage}.0.conv2.weight"] = t(c_out, c_out, 3, 3)
        bn(f"layer{stage}.0.bn2", c_out, sd)
        if stage > 1 or c_in != c_out:
            sd[f"layer{stage}.0.downsample.0.weight"] = t(c_out, c_in, 1, 1)
            bn(f"layer{stage}.0.downsample.1", c_out, sd)
        c_in = c_out
    freq_out = 80 // 8
    sd["embed_a.weight"] = t(16, channels[-1] * freq_out * 2)
    sd["embed_a.bias"] = t(16)

    src = tmp_path / "wespeaker.pt"
    torch.save(sd, str(src))

    from whisperx_tpu.convert.wespeaker import convert_wespeaker_resnet

    out = str(tmp_path / "spk_out")
    convert_wespeaker_resnet(str(src), out)

    model = ResNetSpeakerEmbedding.from_checkpoint(out)
    assert model.dim == 16
    emb = model.embed(synth_speech(2.0, seed=1)[None])
    assert emb.shape == (1, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-4)


def test_diarization_pipeline_accepts_resnet_backend(speech_5s):
    from whisperx_tpu.diarize import DiarizationPipeline

    pipe = DiarizationPipeline(embedding_model=ResNetSpeakerEmbedding())
    df = pipe(speech_5s, max_speakers=2)
    assert set(["start", "end", "speaker"]).issubset(df.columns)
