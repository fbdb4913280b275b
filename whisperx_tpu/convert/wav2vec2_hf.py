"""wav2vec2 alignment-model conversion: HF / torchaudio → whisperx_tpu.

Replaces reference whisperx/convert_alignment_models.py:19-115 (its explicit
PT→MLX weight-name mapping, including the attention-weight transposes).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from whisperx_tpu.convert.checkpoint import save_checkpoint
from whisperx_tpu.models.wav2vec2.model import Wav2Vec2Config


def _load_state_dict(src: str) -> Dict[str, np.ndarray]:
    st = os.path.join(src, "model.safetensors")
    if os.path.exists(st):
        from safetensors.numpy import load_file

        return load_file(st)
    pt = os.path.join(src, "pytorch_model.bin")
    if os.path.exists(pt):
        import torch

        sd = torch.load(pt, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No weights found in {src}")


def _config_from_hf(cfg: dict) -> Wav2Vec2Config:
    return Wav2Vec2Config(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        num_layers=cfg["num_hidden_layers"],
        num_heads=cfg["num_attention_heads"],
        intermediate_size=cfg["intermediate_size"],
        conv_dim=tuple(cfg["conv_dim"]),
        conv_kernel=tuple(cfg["conv_kernel"]),
        conv_stride=tuple(cfg["conv_stride"]),
        num_conv_pos_embeddings=cfg["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=cfg["num_conv_pos_embedding_groups"],
        do_stable_layer_norm=cfg.get("do_stable_layer_norm", False),
        feat_extract_norm=cfg.get("feat_extract_norm", "group"),
    )


def convert_hf_wav2vec2(src: str, out: str, name: Optional[str] = None) -> None:
    """Convert an HF Wav2Vec2ForCTC checkpoint directory."""
    with open(os.path.join(src, "config.json")) as f:
        hf_cfg = json.load(f)
    cfg = _config_from_hf(hf_cfg)
    sd = {
        k.replace("wav2vec2.", ""): np.asarray(v)
        for k, v in _load_state_dict(src).items()
    }

    def lin(prefix):
        return {
            "w": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
            "b": sd[f"{prefix}.bias"],
        }

    def ln(prefix):
        return {"g": sd[f"{prefix}.weight"], "b": sd[f"{prefix}.bias"]}

    convs = []
    for i in range(len(cfg.conv_dim)):
        conv = {
            # torch conv [O, I, W] → ours [W, I, O]
            "w": np.ascontiguousarray(
                sd[f"feature_extractor.conv_layers.{i}.conv.weight"].transpose(2, 1, 0)
            )
        }
        if cfg.feat_extract_norm == "layer":
            conv["ln"] = ln(f"feature_extractor.conv_layers.{i}.layer_norm")
        elif i == 0:
            conv["gn"] = ln(f"feature_extractor.conv_layers.{i}.layer_norm")
        convs.append(conv)

    # positional conv uses torch weight-norm: weight = g * v / ||v||
    if "encoder.pos_conv_embed.conv.weight_g" in sd:
        g = sd["encoder.pos_conv_embed.conv.weight_g"]
        v = sd["encoder.pos_conv_embed.conv.weight_v"]
        norm = np.linalg.norm(v, axis=(0, 1), keepdims=True)
        pos_w = g * v / (norm + 1e-12)
    else:
        pos_w = sd["encoder.pos_conv_embed.conv.weight"]
    # torch grouped conv [O, I/groups, W] → ours [W, I/groups, O]
    pos_w = np.ascontiguousarray(pos_w.transpose(2, 1, 0))

    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        layers.append(
            {
                "attn": {
                    "query": lin(f"{p}.attention.q_proj"),
                    "key": lin(f"{p}.attention.k_proj"),
                    "value": lin(f"{p}.attention.v_proj"),
                    "out": lin(f"{p}.attention.out_proj"),
                },
                "attn_ln": ln(f"{p}.layer_norm"),
                "mlp1": lin(f"{p}.feed_forward.intermediate_dense"),
                "mlp2": lin(f"{p}.feed_forward.output_dense"),
                "mlp_ln": ln(f"{p}.final_layer_norm"),
            }
        )

    params = {
        "feature_extractor": convs,
        "feature_projection": {
            "ln": ln("feature_projection.layer_norm"),
            "proj": lin("feature_projection.projection"),
        },
        "pos_conv": {
            "w": pos_w,
            "b": sd["encoder.pos_conv_embed.conv.bias"],
        },
        "encoder_ln": ln("encoder.layer_norm"),
        "layers": layers,
        "lm_head": lin("lm_head"),
    }

    # vocabulary for the align dictionary
    vocab_path = os.path.join(src, "vocab.json")
    dictionary = {}
    if os.path.exists(vocab_path):
        with open(vocab_path, encoding="utf-8") as f:
            dictionary = json.load(f)

    save_checkpoint(
        out,
        params,
        {
            "family": "wav2vec2",
            "name": name or os.path.basename(str(src).rstrip("/")),
            "config": cfg.__dict__ | {
                "conv_dim": list(cfg.conv_dim),
                "conv_kernel": list(cfg.conv_kernel),
                "conv_stride": list(cfg.conv_stride),
            },
            "dictionary": dictionary,
        },
    )


def convert_torchaudio_wav2vec2(bundle_name: str, out: str) -> None:
    """Convert a torchaudio pipeline bundle (e.g. WAV2VEC2_ASR_BASE_960H)."""
    import torchaudio

    bundle = torchaudio.pipelines.__dict__[bundle_name]
    model = bundle.get_model()
    labels = bundle.get_labels()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    # torchaudio uses its own naming; map through the HF-equivalent layout
    mapped = {}
    for k, v in sd.items():
        nk = (
            k.replace("feature_extractor.conv_layers", "feature_extractor.conv_layers")
            .replace("encoder.feature_projection", "feature_projection")
            .replace("encoder.transformer.pos_conv_embed", "encoder.pos_conv_embed")
            .replace("encoder.transformer.layer_norm", "encoder.layer_norm")
            .replace("encoder.transformer.layers", "encoder.layers")
            .replace("aux", "lm_head")
        )
        mapped[nk] = v

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        # reuse the HF path by materializing a synthetic checkpoint
        cfg = {
            "vocab_size": len(labels),
            "hidden_size": mapped["feature_projection.projection.weight"].shape[0],
            "num_hidden_layers": len(
                {k.split(".")[2] for k in mapped if k.startswith("encoder.layers.")}
            ),
            "num_attention_heads": 12,
            "intermediate_size": mapped[
                "encoder.layers.0.feed_forward.intermediate_dense.weight"
            ].shape[0],
            "conv_dim": [512] * 7,
            "conv_kernel": [10, 3, 3, 3, 3, 2, 2],
            "conv_stride": [5, 2, 2, 2, 2, 2, 2],
            "num_conv_pos_embeddings": 128,
            "num_conv_pos_embedding_groups": 16,
            "do_stable_layer_norm": False,
            "feat_extract_norm": "group",
        }
        with open(os.path.join(tmp, "config.json"), "w") as f:
            json.dump(cfg, f)
        with open(os.path.join(tmp, "vocab.json"), "w") as f:
            json.dump({c.lower(): i for i, c in enumerate(labels)}, f)
        np.savez(os.path.join(tmp, "np_state.npz"), **mapped)
        # write through safetensors if available, else pickle via torch
        try:
            from safetensors.numpy import save_file

            save_file(mapped, os.path.join(tmp, "model.safetensors"))
        except ImportError:
            import torch

            torch.save(
                {k: torch.from_numpy(v) for k, v in mapped.items()},
                os.path.join(tmp, "pytorch_model.bin"),
            )
        convert_hf_wav2vec2(tmp, out, name=bundle_name)
