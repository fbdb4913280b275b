"""Weight-only int8 / int4 quantization with group-wise scales.

Replaces reference backends/mlx_quantization.py (382 LoC). The reference's
compute path dequantizes to fp before the matmul (mlx_quantization.py:109-168)
— which saves memory but not bandwidth. Here the quantized weights stay
int8/int4-packed in HBM and are dequantized on the fly:

  - XLA path (portable, CPU tests): dequant-then-dot, fused by XLA;
  - Pallas path (TPU decode hot loop): fused dequant-matmul kernel streaming
    int8 blocks HBM→VMEM (whisperx_tpu/ops/quant_matmul.py), giving the
    bandwidth win the memory-bound AR decode step actually needs.

Whisper policy parity (mlx_quantization.py:316-352): conv stems and the
first/last decoder blocks stay full precision (the positional skip applies
at production depth, ≥4 decoder blocks — shallow test configs quantize all
blocks so the quant path is still exercised).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    mode: str = "int8"  # "int8" | "int4"
    group_size: int = 64  # scales per `group_size` input channels
    # decoder-only by default: the AR decode step is HBM-bandwidth-bound
    # (reads all decoder weights per token) while the encoder is
    # compute-bound on the MXU, where the int8→bf16 upcast only costs.
    skip_patterns: tuple = ("conv1", "conv2", "pos_emb", "tok_emb", "/encoder")
    # reference accuracy policy (mlx_quantization.py:316-352): the first and
    # last decoder blocks stay full precision — they carry the largest
    # per-layer accuracy sensitivity
    skip_first_last_blocks: bool = True
    min_size: int = 4096  # don't quantize tiny matrices


@jax.tree_util.register_pytree_node_class
class QuantizedLinear:
    """Quantized linear layer params. ``bits``/``group_size`` are static
    pytree metadata so jitted code can branch on them at trace time."""

    def __init__(self, qw, scale, b=None, *, bits: int, group_size: int):
        self.qw = qw
        self.scale = scale
        self.b = b
        self.bits = bits
        self.group_size = group_size

    def tree_flatten(self):
        return (self.qw, self.scale, self.b), (self.bits, self.group_size)

    @classmethod
    def tree_unflatten(cls, aux, children):
        qw, scale, b = children
        bits, group_size = aux
        return cls(qw, scale, b, bits=bits, group_size=group_size)


def quantize_weight(w: np.ndarray, mode: str, group_size: int) -> dict:
    """Quantize a [in, out] matrix group-wise along the input dim.

    Returns {"qw": int8 [in(, packed), out], "scale": f32 [in/g, out],
    "bits": 4|8}. int4 packs two nibbles per int8 along dim 0.
    """
    d_in, d_out = w.shape
    assert d_in % group_size == 0, (d_in, group_size)
    if mode == "int4" and group_size % 2 != 0:
        raise ValueError(
            f"int4 packs two nibbles per byte: group_size must be even, got {group_size}"
        )
    g = d_in // group_size
    wg = np.asarray(w, np.float32).reshape(g, group_size, d_out)
    max_abs = np.abs(wg).max(axis=1, keepdims=True)  # [g, 1, out]
    qmax = 127.0 if mode == "int8" else 7.0
    scale = np.maximum(max_abs / qmax, 1e-10)
    q = np.clip(np.round(wg / scale), -qmax, qmax).astype(np.int8)
    if mode == "int4":
        # pack group halves: low nibble = first half of each group's rows,
        # high nibble = second half — unpacking stays contiguous per group.
        half = group_size // 2
        lo = q[:, :half] & 0x0F
        hi = (q[:, half:] & 0x0F) << 4
        q = (lo | hi).astype(np.int8).reshape(d_in // 2, d_out)
    else:
        q = q.reshape(d_in, d_out)
    return {
        "qw": jnp.asarray(q),
        "scale": jnp.asarray(scale.reshape(g, d_out), jnp.float32),
        "bits": 8 if mode == "int8" else 4,
        "group_size": group_size,
    }


def make_quantized_linear(w: np.ndarray, mode: str, group_size: int, b=None) -> QuantizedLinear:
    qp = quantize_weight(w, mode, group_size)
    return QuantizedLinear(
        qp["qw"], qp["scale"], b, bits=qp["bits"], group_size=group_size
    )


def _unpack_int4(qw: jnp.ndarray, group_size: int) -> jnp.ndarray:
    """[in/2, out] packed int8 -> [in, out] int8 nibbles (group-half layout)."""
    d_half, d_out = qw.shape
    g = (d_half * 2) // group_size
    half = group_size // 2
    as_u8 = qw.astype(jnp.uint8).reshape(g, half, d_out)
    lo = (as_u8 & 0x0F).astype(jnp.int8)
    hi = (as_u8 >> 4).astype(jnp.int8)
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=1).reshape(g * group_size, d_out)


def dequantize(qp: QuantizedLinear, dtype=jnp.bfloat16) -> jnp.ndarray:
    qw = qp.qw
    group = qp.group_size
    if qp.bits == 4:
        qw = _unpack_int4(qw, group)
    d_in, d_out = qw.shape
    g = qp.scale.shape[0]
    w = qw.astype(jnp.float32).reshape(g, group, d_out) * qp.scale[:, None, :]
    return w.reshape(d_in, d_out).astype(dtype)


def quant_linear_apply(qp: QuantizedLinear, x: jnp.ndarray) -> jnp.ndarray:
    """y = x @ dequant(qw) (+ b). Uses the Pallas fused kernel on TPU for
    int8 when shapes allow; falls back to XLA dequant-dot elsewhere."""
    from whisperx_tpu.ops.quant_matmul import quant_matmul

    y = quant_matmul(x, qp)
    if qp.b is not None:
        y = y + qp.b
    return y


def quantize_tree(params, config: QuantConfig):
    """Walk a param pytree, replacing eligible linear {"w","b"} dicts with
    quantized {"qw","scale","bits","b"} dicts."""

    skip = list(config.skip_patterns)
    if config.skip_first_last_blocks:
        try:
            nb = len(params["decoder"]["blocks"])
        except (KeyError, TypeError):
            nb = 0  # non-whisper tree: positional policy doesn't apply
        # only at production depth — for shallow test configs, dropping two
        # of two blocks would disable quantization entirely
        if nb >= 4:
            skip += ["/decoder/blocks/0/", f"/decoder/blocks/{nb - 1}/"]

    def eligible(path: str, node: dict) -> bool:
        if any(pat in path for pat in skip):
            return False
        w = node["w"]
        if w.ndim != 2 or w.size < config.min_size:
            return False
        return w.shape[0] % config.group_size == 0

    def walk(node, path=""):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") and eligible(path, node):
                return make_quantized_linear(
                    np.asarray(node["w"], np.float32),
                    config.mode,
                    config.group_size,
                    b=node.get("b"),
                )
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params)


def quantize_model(
    model,
    mode: str = "int8",
    group_size: Optional[int] = None,
    config: Optional[QuantConfig] = None,
):
    """Return a new Whisper-like model with weight-only quantized params."""
    from whisperx_tpu.models.whisper import Whisper

    gs = group_size or 64
    if config is None:
        config = QuantConfig(mode=mode, group_size=gs)
    qparams = quantize_tree(model.params, config)
    return Whisper(
        model.dims,
        qparams,
        dtype=model.dtype,
        name=f"{model.name}-{mode}",
        alignment_heads=model.alignment_heads,
        vocab_path=model.vocab_path,
    )
