"""Multi-host execution: file-level sharding over DCN.

SURVEY.md §5.8: the reference has no distributed substrate at all; the
natural TPU extension is two-level — *within* a host, chunk batches shard
over the ICI mesh (`data_parallel.py`); *across* hosts, whole files shard
over DCN, because audio files are embarrassingly parallel and cross-host
collectives would only add latency to an inference pipeline. Each process
transcribes its own slice with its local mesh and writes its own outputs;
no gradient-style synchronization exists to need DCN collectives.

On a TPU pod slice, ``jax.distributed.initialize()`` picks up the
coordinator from the TPU environment automatically; elsewhere pass the
coordinator address/process count explicitly (or set JAX_COORDINATOR_*).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> tuple:
    """Join the multi-process JAX runtime; returns (process_id, n_processes).

    No-op (0, 1) when already initialized or when running single-process.
    """
    # Do NOT probe jax.process_count() first: it INITIALIZES the XLA
    # backend, after which jax.distributed.initialize refuses to run at
    # all ("must be called before any JAX calls") — found the first time
    # this ran with two real processes. Attempt initialize directly and
    # treat double-initialization as the already-joined case.
    if coordinator_address is not None:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    else:
        try:
            # TPU pod env: coordinator discovered from the TPU metadata
            jax.distributed.initialize()
        except Exception:
            return 0, 1  # single host
    return jax.process_index(), jax.process_count()


def shard_files(
    paths: Sequence[str],
    process_id: Optional[int] = None,
    n_processes: Optional[int] = None,
) -> List[str]:
    """This host's slice of the file list (strided so early/large-batch
    submissions spread evenly rather than front-loading host 0)."""
    pid = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if n_processes is None else n_processes
    return list(paths)[pid::n]
