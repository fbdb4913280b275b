"""Device-mesh plumbing for SPMD execution.

The reference has no distributed substrate (SURVEY.md §2.11, §5.8) — its
"parallelism" is batching plus OS processes. The TPU build scales instead via
a `jax.sharding.Mesh` with two logical axes:

  - ``data``  : batch (30 s audio chunks) — data parallelism over ICI
  - ``model`` : attention heads / MLP hidden — tensor parallelism

Model code calls :func:`shard` to annotate intermediates; without an active
mesh it is a no-op, so single-chip and CPU-test paths pay nothing.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Model-axis neighbours are placed adjacent so tensor-parallel collectives
    ride the fastest ICI links.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (n_data, n_model, len(devices))
    arr = np.array(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def set_mesh(mesh: Optional[Mesh]) -> None:
    _state.mesh = mesh


def get_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh]):
    prev = get_mesh()
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(prev)


def shard(x, *spec):
    """Constrain ``x`` to PartitionSpec(*spec) on the active mesh (no-op if none)."""
    mesh = get_mesh()
    if mesh is None:
        return x
    # Drop axis names the mesh doesn't have (lets the same annotations serve
    # pure-DP and DP+TP meshes).
    cleaned = tuple(
        s if (s is None or s in mesh.axis_names) else None for s in spec
    )
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*cleaned)))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def _tp_spec_for(path: str, leaf) -> P:
    """Tensor-parallel PartitionSpec for a whisper/wav2vec2-style param leaf.

    Rules (Megatron-style column/row split, but expressed as shardings and
    left to XLA to insert the psums):
      - q/k/v and mlp up-projection weights: shard output dim over 'model'
      - out-projection and mlp down-projection: shard input dim over 'model'
      - embeddings, norms, convs, biases of row-parallel layers: replicated
    """
    parts = path.split("/")
    name = parts[-2] if len(parts) >= 2 else ""
    leafname = parts[-1]
    if leaf.ndim < 2:
        if leafname == "b" and name in ("query", "key", "value", "mlp1"):
            return P(MODEL_AXIS)
        return P()
    if name in ("query", "key", "value", "mlp1"):
        return P(None, MODEL_AXIS)  # (in, out) column-parallel
    if name in ("out", "mlp2"):
        return P(MODEL_AXIS, None)  # row-parallel
    return P()


def walk_params_tp(params, mesh: Mesh, leaf_fn, quant_fn):
    """Walk a param pytree applying the TP placement policy per leaf.

    ``leaf_fn(leaf, NamedSharding)`` handles arrays; ``quant_fn(ql, rep)``
    handles ``QuantizedLinear`` bundles (given the replicated sharding).
    Shared by the real placement (:func:`shard_params_tp`) and the
    AOT-lowering tests, which build abstract ``ShapeDtypeStruct`` trees at
    production dims without materializing gigabytes of weights.
    """

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, f"{path}/{k}") for k, v in tree.items()}
        if isinstance(tree, (list, tuple)):
            t = [walk(v, f"{path}/{i}") for i, v in enumerate(tree)]
            return type(tree)(t)
        from whisperx_tpu.quant.core import QuantizedLinear

        if isinstance(tree, QuantizedLinear):
            return quant_fn(tree, NamedSharding(mesh, P()))
        spec = _tp_spec_for(path, tree)
        return leaf_fn(tree, NamedSharding(mesh, spec))

    return walk(params, "")


def shard_params_tp(params, mesh: Mesh):
    """Place a param pytree on ``mesh`` with TP sharding over MODEL_AXIS.

    Weight-only quantized linears (``quant.core.QuantizedLinear``) are
    REPLICATED rather than split: XLA's SPMD partitioner cannot slice the
    opaque Pallas dequant-matmul call, and the group-wise scale rows must
    stay aligned with their K-dim weight slices. Correctness first — the
    surrounding activation sharding constraints still hold, so a
    quantized model runs on the mesh with data parallelism intact (TP
    then saves no weight HBM on those layers; int8's purpose is capacity,
    docs/PERFORMANCE.md)."""
    from whisperx_tpu.quant.core import QuantizedLinear

    def quant_fn(tree, rep):
        put = lambda x: None if x is None else jax.device_put(x, rep)
        return QuantizedLinear(
            put(tree.qw), put(tree.scale), put(tree.b),
            bits=tree.bits, group_size=tree.group_size,
        )

    return walk_params_tp(
        params, mesh, lambda leaf, s: jax.device_put(leaf, s), quant_fn
    )
