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


def flatten_tree(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            flat.update(flatten_tree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            flat.update(flatten_tree(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
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
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

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
            k: jnp.asarray(v, dtype if np.issubdtype(v.dtype, np.floating) else None)
            for k, v in flat.items()
        }
    return unflatten_tree(flat), config


def is_checkpoint_dir(path: str) -> bool:
    return os.path.isdir(path) and os.path.exists(os.path.join(path, "weights.npz"))
