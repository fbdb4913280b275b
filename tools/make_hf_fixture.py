#!/usr/bin/env python
"""Build a SYNTHETIC HuggingFace-format Whisper checkpoint directory.

Purpose (VERDICT r2 Missing #1): the convert → transcribe → score recipe
must be provable end-to-end on a hermetic host, so the first run on a
connected machine (with real weights) is turnkey rather than a debugging
session. This tool fabricates everything a real HF snapshot provides:

  - config.json with real field names (``_hf_dims`` parity),
  - pytorch_model.bin holding a random-weight state dict under the exact
    HF parameter names ``convert_hf_whisper`` maps,
  - vocab.json + merges.txt forming a VALID full-rank GPT-2 byte-level
    BPE table (256 single-byte tokens, then two-byte merges) that
    ``_maybe_export_vocab`` exports to a complete vocab.tiktoken — so the
    REAL tiktoken tokenizer path runs, not the byte fallback.

Usage:
    python tools/make_hf_fixture.py OUT_DIR [--config test-nano] [--seed 0]
"""

import argparse
import json
import os

import sys

# Run-from-anywhere: the in-tree package is the subject under test.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def gpt2_byte_encoder():
    """byte → unicode char mapping (the public GPT-2 algorithm; inverse of
    convert/whisper_hf.py::_maybe_export_vocab's decoder)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


def synthetic_vocab(n_base: int):
    """A valid full-rank BPE table: ranks 0..255 are the single bytes,
    ranks 256.. are two-byte concatenations (each merging two lower-rank
    tokens, so tiktoken accepts the table). Returns (vocab dict mapping
    GPT-2-unicode token → rank, merges lines)."""
    enc = gpt2_byte_encoder()
    vocab = {enc[b]: b for b in range(256)}
    merges = []
    rank = 256
    for i in range(256):
        if rank >= n_base:
            break
        for j in range(256):
            if rank >= n_base:
                break
            a, b = enc[i], enc[j]
            vocab[a + b] = rank
            merges.append(f"{a} {b}")
            rank += 1
    assert len(vocab) == n_base, (len(vocab), n_base)
    return vocab, merges


def build_fixture(out: str, config: str = "test-nano", seed: int = 0) -> str:
    import numpy as np
    import torch

    from whisperx_tpu.models.whisper.config import get_dims

    dims = get_dims(config)
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)

    def t(*shape, scale=0.05):
        return torch.from_numpy(
            (rng.standard_normal(shape) * scale).astype(np.float32)
        )

    d = dims.n_audio_state
    sd = {}
    sd["model.encoder.conv1.weight"] = t(d, dims.n_mels, 3)
    sd["model.encoder.conv1.bias"] = t(d)
    sd["model.encoder.conv2.weight"] = t(d, d, 3)
    sd["model.encoder.conv2.bias"] = t(d)
    sd["model.encoder.embed_positions.weight"] = t(dims.n_audio_ctx, d)

    def attn(prefix, d_in):
        sd[f"{prefix}.q_proj.weight"] = t(d_in, d_in)
        sd[f"{prefix}.q_proj.bias"] = t(d_in)
        sd[f"{prefix}.k_proj.weight"] = t(d_in, d_in)
        sd[f"{prefix}.v_proj.weight"] = t(d_in, d_in)
        sd[f"{prefix}.v_proj.bias"] = t(d_in)
        sd[f"{prefix}.out_proj.weight"] = t(d_in, d_in)
        sd[f"{prefix}.out_proj.bias"] = t(d_in)

    def ln(prefix, d_in):
        sd[f"{prefix}.weight"] = torch.ones(d_in)
        sd[f"{prefix}.bias"] = torch.zeros(d_in)

    def layer(prefix, cross):
        attn(f"{prefix}.self_attn", d)
        ln(f"{prefix}.self_attn_layer_norm", d)
        if cross:
            attn(f"{prefix}.encoder_attn", d)
            ln(f"{prefix}.encoder_attn_layer_norm", d)
        sd[f"{prefix}.fc1.weight"] = t(4 * d, d)
        sd[f"{prefix}.fc1.bias"] = t(4 * d)
        sd[f"{prefix}.fc2.weight"] = t(d, 4 * d)
        sd[f"{prefix}.fc2.bias"] = t(d)
        ln(f"{prefix}.final_layer_norm", d)

    for i in range(dims.n_audio_layer):
        layer(f"model.encoder.layers.{i}", cross=False)
    ln("model.encoder.layer_norm", d)

    sd["model.decoder.embed_tokens.weight"] = t(dims.n_vocab, d)
    sd["model.decoder.embed_positions.weight"] = t(dims.n_text_ctx, d)
    for i in range(dims.n_text_layer):
        layer(f"model.decoder.layers.{i}", cross=True)
    ln("model.decoder.layer_norm", d)

    torch.save(sd, os.path.join(out, "pytorch_model.bin"))

    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(
            {
                "num_mel_bins": dims.n_mels,
                "max_source_positions": dims.n_audio_ctx,
                "d_model": d,
                "encoder_attention_heads": dims.n_audio_head,
                "encoder_layers": dims.n_audio_layer,
                "vocab_size": dims.n_vocab,
                "max_target_positions": dims.n_text_ctx,
                "decoder_attention_heads": dims.n_text_head,
                "decoder_layers": dims.n_text_layer,
            },
            f,
        )

    # full-rank synthetic BPE (multilingual n_base = 50257 for 51865 vocab)
    n_base = 50257 if dims.n_vocab >= 51865 else 50256
    vocab, merges = synthetic_vocab(n_base)
    with open(os.path.join(out, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(out, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: synthetic\n" + "\n".join(merges) + "\n")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--config", default="test-nano")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    build_fixture(args.out, args.config, args.seed)
    print(json.dumps({"fixture": args.out, "config": args.config}))


if __name__ == "__main__":
    main()
