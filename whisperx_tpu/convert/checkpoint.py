"""On-disk checkpoint format for all whisperx_tpu model families.

A checkpoint directory contains:
  - ``weights.npz``   : flat ``{"a/b/0/w": array}`` mapping of the param pytree
  - ``config.json``   : model family + dimensions + metadata (alignment heads…)
  - ``vocab.tiktoken``: optional BPE ranks file (whisper family)

This replaces the reference's reliance on HF-hub downloads inside
``mlx_whisper.load_models.load_model`` (SURVEY.md §2.9) with an explicit,
offline-friendly artifact produced by the converters in this package.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import numpy as np


_QUANT_MARKER = "__quantized_linear__"
_EMPTY_DICT = "__empty_dict__"
_EMPTY_LIST = "__empty_list__"


def _to_numpy(x) -> np.ndarray:
    """np.ndarray savable by np.savez: ml_dtypes types (bfloat16, …) have
    no stock-numpy representation and round-trip as raw void — widen them
    to float32 at save time."""
    arr = np.asarray(x)
    if arr.dtype.kind not in "fiub":
        arr = arr.astype(np.float32)
    return arr


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        if not tree and prefix:  # empty containers must survive round-trip
            flat[f"{prefix[:-1]}{_EMPTY_DICT}"] = np.zeros(0, np.int8)
        for k, v in tree.items():
            flat.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        if not tree and prefix:
            flat[f"{prefix[:-1]}{_EMPTY_LIST}"] = np.zeros(0, np.int8)
        for i, v in enumerate(tree):
            flat.update(flatten_tree(v, f"{prefix}{i}/"))
    elif type(tree).__name__ == "QuantizedLinear":
        # weight-only quantized layer: persist tensors + static metadata
        flat[f"{prefix}{_QUANT_MARKER}/qw"] = _to_numpy(tree.qw)
        flat[f"{prefix}{_QUANT_MARKER}/scale"] = _to_numpy(tree.scale)
        if tree.b is not None:
            flat[f"{prefix}{_QUANT_MARKER}/b"] = _to_numpy(tree.b)
        flat[f"{prefix}{_QUANT_MARKER}/meta"] = np.asarray(
            [tree.bits, tree.group_size], np.int64
        )
    else:
        flat[prefix[:-1]] = _to_numpy(tree)
    return flat


def unflatten_tree(flat: Dict[str, np.ndarray]):
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        if _QUANT_MARKER in node:
            from whisperx_tpu.quant.core import QuantizedLinear

            q = node[_QUANT_MARKER]
            bits, group_size = (int(x) for x in q["meta"])
            return QuantizedLinear(
                q["qw"], q["scale"], q.get("b"), bits=bits, group_size=group_size
            )
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        out = {}
        for k, v in node.items():
            if k.endswith(_EMPTY_DICT):
                out[k[: -len(_EMPTY_DICT)]] = {}
            elif k.endswith(_EMPTY_LIST):
                out[k[: -len(_EMPTY_LIST)]] = []
            else:
                out[k] = listify(v)
        return out

    return listify(root)


def save_checkpoint(path: str, params, config: dict) -> None:
    os.makedirs(path, exist_ok=True)
    flat = flatten_tree(params)
    np.savez(os.path.join(path, "weights.npz"), **flat)
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(config, f, indent=2)


def load_checkpoint(path: str, dtype=None) -> Tuple[Any, dict]:
    with open(os.path.join(path, "config.json")) as f:
        config = json.load(f)
    with np.load(os.path.join(path, "weights.npz")) as data:
        flat = {k: data[k] for k in data.files}
    if dtype is not None:
        import jax.numpy as jnp

        flat = {
            k: jnp.asarray(
                v,
                dtype
                if np.issubdtype(v.dtype, np.floating) and _QUANT_MARKER not in k
                else None,
            )
            for k, v in flat.items()
        }
    return unflatten_tree(flat), config


def is_checkpoint_dir(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "weights.npz"))
