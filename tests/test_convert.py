"""Converter round-trip tests: synthetic HF checkpoints → our format →
loadable model with correct shapes and a running forward pass."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _make_hf_whisper_dir(tmp_path, d=64, layers=2, heads=2, mels=80, vocab=51865):
    """Build a minimal HF WhisperForConditionalGeneration checkpoint."""
    rng = np.random.default_rng(0)

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    sd = {}
    sd["model.encoder.conv1.weight"] = t(d, mels, 3)
    sd["model.encoder.conv1.bias"] = t(d)
    sd["model.encoder.conv2.weight"] = t(d, d, 3)
    sd["model.encoder.conv2.bias"] = t(d)
    sd["model.encoder.embed_positions.weight"] = t(1500, d)
    sd["model.encoder.layer_norm.weight"] = t(d)
    sd["model.encoder.layer_norm.bias"] = t(d)
    sd["model.decoder.embed_tokens.weight"] = t(vocab, d)
    sd["model.decoder.embed_positions.weight"] = t(448, d)
    sd["model.decoder.layer_norm.weight"] = t(d)
    sd["model.decoder.layer_norm.bias"] = t(d)

    def attn(prefix, bias_k=False):
        sd[f"{prefix}.q_proj.weight"] = t(d, d)
        sd[f"{prefix}.q_proj.bias"] = t(d)
        sd[f"{prefix}.k_proj.weight"] = t(d, d)
        sd[f"{prefix}.v_proj.weight"] = t(d, d)
        sd[f"{prefix}.v_proj.bias"] = t(d)
        sd[f"{prefix}.out_proj.weight"] = t(d, d)
        sd[f"{prefix}.out_proj.bias"] = t(d)

    for i in range(layers):
        for side, cross in (("encoder", False), ("decoder", True)):
            p = f"model.{side}.layers.{i}"
            attn(f"{p}.self_attn")
            sd[f"{p}.self_attn_layer_norm.weight"] = t(d)
            sd[f"{p}.self_attn_layer_norm.bias"] = t(d)
            if cross:
                attn(f"{p}.encoder_attn")
                sd[f"{p}.encoder_attn_layer_norm.weight"] = t(d)
                sd[f"{p}.encoder_attn_layer_norm.bias"] = t(d)
            sd[f"{p}.fc1.weight"] = t(4 * d, d)
            sd[f"{p}.fc1.bias"] = t(4 * d)
            sd[f"{p}.fc2.weight"] = t(d, 4 * d)
            sd[f"{p}.fc2.bias"] = t(d)
            sd[f"{p}.final_layer_norm.weight"] = t(d)
            sd[f"{p}.final_layer_norm.bias"] = t(d)

    src = tmp_path / "hf_whisper"
    src.mkdir()
    torch.save(sd, src / "pytorch_model.bin")
    config = {
        "num_mel_bins": mels,
        "max_source_positions": 1500,
        "d_model": d,
        "encoder_attention_heads": heads,
        "encoder_layers": layers,
        "vocab_size": vocab,
        "max_target_positions": 448,
        "decoder_attention_heads": heads,
        "decoder_layers": layers,
    }
    (src / "config.json").write_text(json.dumps(config))
    (src / "generation_config.json").write_text(
        json.dumps({"alignment_heads": [[1, 0], [1, 1]]})
    )
    return str(src), sd


def test_whisper_hf_roundtrip(tmp_path):
    import jax.numpy as jnp

    from whisperx_tpu.convert.whisper_hf import convert_hf_whisper
    from whisperx_tpu.models.whisper import load_model
    from whisperx_tpu.models.whisper.model import encoder_forward

    src, sd = _make_hf_whisper_dir(tmp_path)
    out = str(tmp_path / "converted")
    convert_hf_whisper(src, out)

    model = load_model(out, dtype=jnp.float32)
    assert model.dims.n_audio_state == 64
    assert model.dims.n_vocab == 51865
    assert model.alignment_heads == [(1, 0), (1, 1)]

    # weight mapping: conv transpose + linear transpose spot checks
    conv1 = np.asarray(model.params["encoder"]["conv1"]["w"])
    np.testing.assert_allclose(
        conv1,
        sd["model.encoder.conv1.weight"].numpy().transpose(2, 1, 0),
        atol=1e-6,
    )
    q = np.asarray(model.params["decoder"]["blocks"][0]["attn"]["query"]["w"])
    np.testing.assert_allclose(
        q,
        sd["model.decoder.layers.0.self_attn.q_proj.weight"].numpy().T,
        atol=1e-6,
    )
    # decoder k_proj has no bias in whisper
    assert "b" not in model.params["decoder"]["blocks"][0]["attn"]["key"]

    feats = encoder_forward(
        model.params,
        jnp.zeros((1, 3000, 80), jnp.float32),
        model.dims.n_audio_head,
    )
    assert feats.shape == (1, 1500, 64)
    assert bool(jnp.isfinite(feats).all())


def test_wav2vec2_hf_roundtrip(tmp_path):
    import jax.numpy as jnp

    from whisperx_tpu.convert.wav2vec2_hf import convert_hf_wav2vec2
    from whisperx_tpu.models.wav2vec2.model import Wav2Vec2Config, forward

    rng = np.random.default_rng(1)

    def t(*shape):
        return torch.from_numpy(rng.standard_normal(shape).astype(np.float32) * 0.05)

    conv_dim = [32] * 7
    kernels = [10, 3, 3, 3, 3, 2, 2]
    d, inter, layers = 64, 128, 2
    sd = {}
    d_in = 1
    for i, (cd, kk) in enumerate(zip(conv_dim, kernels)):
        sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"] = t(cd, d_in, kk)
        if i == 0:
            sd["wav2vec2.feature_extractor.conv_layers.0.layer_norm.weight"] = t(cd)
            sd["wav2vec2.feature_extractor.conv_layers.0.layer_norm.bias"] = t(cd)
        d_in = cd
    sd["wav2vec2.feature_projection.layer_norm.weight"] = t(conv_dim[-1])
    sd["wav2vec2.feature_projection.layer_norm.bias"] = t(conv_dim[-1])
    sd["wav2vec2.feature_projection.projection.weight"] = t(d, conv_dim[-1])
    sd["wav2vec2.feature_projection.projection.bias"] = t(d)
    # torch weight_norm(dim=2): v = full conv weight [O, I/groups, W],
    # g = per-kernel-position gains [1, 1, W]
    sd["wav2vec2.encoder.pos_conv_embed.conv.weight_g"] = t(1, 1, 128)
    sd["wav2vec2.encoder.pos_conv_embed.conv.weight_v"] = t(d, d // 16, 128)
    sd["wav2vec2.encoder.pos_conv_embed.conv.bias"] = t(d)
    sd["wav2vec2.encoder.layer_norm.weight"] = t(d)
    sd["wav2vec2.encoder.layer_norm.bias"] = t(d)
    for i in range(layers):
        p = f"wav2vec2.encoder.layers.{i}"
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.attention.{name}.weight"] = t(d, d)
            sd[f"{p}.attention.{name}.bias"] = t(d)
        sd[f"{p}.layer_norm.weight"] = t(d)
        sd[f"{p}.layer_norm.bias"] = t(d)
        sd[f"{p}.feed_forward.intermediate_dense.weight"] = t(inter, d)
        sd[f"{p}.feed_forward.intermediate_dense.bias"] = t(inter)
        sd[f"{p}.feed_forward.output_dense.weight"] = t(d, inter)
        sd[f"{p}.feed_forward.output_dense.bias"] = t(d)
        sd[f"{p}.final_layer_norm.weight"] = t(d)
        sd[f"{p}.final_layer_norm.bias"] = t(d)
    sd["lm_head.weight"] = t(32, d)
    sd["lm_head.bias"] = t(32)

    src = tmp_path / "hf_w2v"
    src.mkdir()
    torch.save(sd, src / "pytorch_model.bin")
    (src / "config.json").write_text(
        json.dumps(
            {
                "vocab_size": 32,
                "hidden_size": d,
                "num_hidden_layers": layers,
                "num_attention_heads": 2,
                "intermediate_size": inter,
                "conv_dim": conv_dim,
                "conv_kernel": kernels,
                "conv_stride": [5, 2, 2, 2, 2, 2, 2],
                "num_conv_pos_embeddings": 128,
                "num_conv_pos_embedding_groups": 16,
                "do_stable_layer_norm": False,
                "feat_extract_norm": "group",
            }
        )
    )
    (src / "vocab.json").write_text(json.dumps({"<pad>": 0, "|": 4, "e": 5}))

    out = str(tmp_path / "w2v_out")
    convert_hf_wav2vec2(src, out)

    from whisperx_tpu.convert.checkpoint import load_checkpoint

    params, meta = load_checkpoint(out)
    cfg = Wav2Vec2Config(**meta["config"])
    emissions = forward(params, cfg, jnp.zeros((1, 4000), jnp.float32))
    assert emissions.shape[0] == 1 and emissions.shape[2] == 32
    assert meta["dictionary"]["<pad>"] == 0


def test_checkpoint_roundtrip_preserves_empty_containers(tmp_path):
    """Empty lists/dicts must survive save→load (regression: flatten_tree
    silently dropped them, so e.g. a PyanNet with zero linear layers lost
    its 'linear' key and forward raised KeyError)."""
    from whisperx_tpu.convert.checkpoint import load_checkpoint, save_checkpoint

    params = {
        "a": np.ones((2, 2), np.float32),
        "linear": [],
        "empty_cfg": {},
        "nested": {"items": [], "w": np.zeros(3, np.float32)},
    }
    out = str(tmp_path / "ckpt")
    save_checkpoint(out, params, {"family": "test"})
    loaded, _ = load_checkpoint(out)
    assert loaded["linear"] == []
    assert loaded["empty_cfg"] == {}
    assert loaded["nested"]["items"] == []
    assert loaded["nested"]["w"].shape == (3,)
