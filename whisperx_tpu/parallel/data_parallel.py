"""Data/tensor-parallel pipeline execution over a device mesh.

The user-facing entry the reference has no analogue for (SURVEY.md §2.11,
§5.8 — its "parallelism" is batching + OS processes): when more than one
device is available, :func:`data_parallel_transcribe` runs the SHIPPED
pipeline — device-side chunking, batched `_decode_jit` while_loop with
filters and int8 cross-KV, temperature fallback — with every decode batch
sharded over the mesh ``data`` axis and (optionally) the model
tensor-parallel over ``model``. The decode program itself is unchanged:
``decoding.decode.decode_dispatch`` places batches onto the active mesh, so
single-chip and sharded runs execute the same XLA graph modulo shardings.
"""

from __future__ import annotations

from typing import Optional

import jax

from whisperx_tpu.parallel.sharding import (
    DATA_AXIS,
    make_mesh,
    shard_params_tp,
    use_mesh,
)


def data_parallel_transcribe(
    pipeline,
    audio,
    *,
    mesh=None,
    n_model: int = 1,
    batch_size: Optional[int] = None,
    **kwargs,
):
    """Transcribe with chunk batches sharded over the mesh ``data`` axis.

    ``pipeline``: a ``TranscriptionPipeline`` (asr.load_model). ``mesh``:
    an existing (data, model) mesh, or None to build one over every local
    device with ``n_model``-way tensor parallelism. The model's parameters
    are placed on the mesh (TP-sharded over 'model', replicated over
    'data') on first use; the batch size is rounded up to a multiple of
    the data-axis size so every device batch shards evenly.

    Returns the ordinary ``TranscriptionResult``.
    """
    if mesh is None:
        mesh = make_mesh(n_model=n_model)
    n_data = mesh.shape[DATA_AXIS]

    placed = getattr(pipeline.model, "_dp_mesh", None)
    if placed is not mesh:
        pipeline.model.params = shard_params_tp(pipeline.model.params, mesh)
        pipeline.model._dp_mesh = mesh

    bs = batch_size or pipeline.batch_size
    bs = -(-bs // n_data) * n_data
    with use_mesh(mesh):
        return pipeline.transcribe(audio, batch_size=bs, **kwargs)


def maybe_data_parallel(pipeline):
    """True when >1 addressable device makes the DP path worthwhile."""
    return len(jax.devices()) > 1


class DataParallelPipeline:
    """Drop-in pipeline proxy that runs every decode on the mesh.

    Wraps a ``TranscriptionPipeline`` so callers that only know the
    pipeline protocol (the CLI, ``serve.ContinuousBatcher``,
    ``serve.StreamingTranscriber``) transparently get batches sharded
    over the ``data`` axis (and the model tensor-parallel over ``model``
    when ``n_model > 1``). Parameters are placed on the mesh once, on
    construction; batch sizes are rounded up to a multiple of the data
    axis so every device batch shards evenly.
    """

    def __init__(self, pipeline, mesh=None, n_model: int = 1):
        self.pipeline = pipeline
        self.mesh = mesh if mesh is not None else make_mesh(n_model=n_model)
        self._n_data = self.mesh.shape[DATA_AXIS]
        pipeline.model.params = shard_params_tp(pipeline.model.params, self.mesh)
        pipeline.model._dp_mesh = self.mesh

    def _round(self, batch_size: Optional[int]) -> int:
        bs = batch_size or self.pipeline.batch_size
        return -(-bs // self._n_data) * self._n_data

    def transcribe(self, audio, batch_size: Optional[int] = None, **kwargs):
        with use_mesh(self.mesh):
            return self.pipeline.transcribe(
                audio, batch_size=self._round(batch_size), **kwargs
            )

    def transcribe_many(self, audios, batch_size: Optional[int] = None, **kwargs):
        with use_mesh(self.mesh):
            return self.pipeline.transcribe_many(
                audios, batch_size=self._round(batch_size), **kwargs
            )

    def warmup(self, batch_size: Optional[int] = None,
               duration_s: float = 65.0):
        """Compile the MESH-placed serving programs. Deliberately not
        forwarded via __getattr__: the inner pipeline's warmup would
        compile single-device programs, which real DP traffic never
        runs."""
        from whisperx_tpu.asr import warmup_audio

        return self.transcribe(
            warmup_audio(duration_s), batch_size=batch_size
        )

    def __getattr__(self, name):
        # model / language / task / detect_language / model_prompt / ...
        return getattr(self.pipeline, name)
