"""Fused dequantize-matmul for weight-only quantized linears.

The autoregressive decode step is HBM-bandwidth-bound: every token reads the
full decoder weights. Keeping weights int8/int4 in HBM and dequantizing in
VMEM cuts that traffic 2-4× — the win the reference's dequant-to-fp path
never realized (mlx_quantization.py:109-168 materializes fp weights first).

Two implementations:
  - ``_quant_matmul_xla``: portable dequant-then-dot (CPU tests, fallback);
  - ``_quant_matmul_pallas``: tiled Pallas kernel, grid (M/TM, N/TN, K/TK),
    int8 weight blocks streamed HBM→VMEM, per-group scales applied to the
    f32 partials in the accumulator.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _largest_tile(dim: int, preferred: int, quantum: int) -> int:
    """Largest divisor of ``dim`` that is ≤ preferred and a multiple of
    ``quantum`` (falls back to dim itself)."""
    best = dim
    for t in range(preferred, quantum - 1, -quantum):
        if dim % t == 0:
            return t
    return best


def _k_tile(k: int, group_size: int) -> int | None:
    """K tile: must divide k, satisfy the 128-lane constraint, AND be a
    multiple of group_size so scale rows align with the sliced K chunks —
    a tile that is merely a multiple of 128 would apply scales to
    misaligned slices (silent numeric corruption). None = no legal tile
    (caller falls back to the XLA path)."""
    import math

    quantum = math.lcm(128, group_size)
    top = (512 // quantum) * quantum
    for t in range(top, 0, -quantum):
        if k % t == 0:
            return t
    return None


def _int8_matmul_kernel(x_ref, qw_ref, scale_ref, out_ref, acc_ref, *, n_groups_per_k):
    """One (TM, TN) output tile; K-dim accumulated across grid axis 2.

    ``scale_ref`` holds ALL K groups for this N tile (the per-K-tile group
    count is too small for a legal sublane block); rows are indexed by the
    K-grid position.
    """
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]  # [TM, TK] bf16/f32
    qw = qw_ref[:]  # [TK, TN] int8
    tm, tk = x.shape
    group = tk // n_groups_per_k

    acc = acc_ref[:]
    for g in range(n_groups_per_k):
        xs = x[:, g * group : (g + 1) * group]
        ws = qw[g * group : (g + 1) * group, :].astype(jnp.bfloat16)
        partial = jnp.dot(xs, ws, preferred_element_type=jnp.float32)
        scale_row = scale_ref[k_idx * n_groups_per_k + g]  # [TN]
        acc = acc + partial * scale_row[None, :]
    acc_ref[:] = acc

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group_size", "interpret"))
def _quant_matmul_pallas_int8(x, qw, scale, group_size: int, interpret: bool = False):
    """x: [M, K] bf16; qw: [K, N] int8; scale: [K/g, N] f32 -> [M, N]."""
    m, k = x.shape
    n = qw.shape[1]
    # Mosaic block constraints: trailing dims of every block must be
    # (multiple of 8, multiple of 128) or span the full array dimension.
    tm = _largest_tile(m, 256, 8) if m >= 8 else m
    tn = _largest_tile(n, 512, 128)
    tk = _k_tile(k, group_size)
    assert tk is not None, "dispatch must pre-check _k_tile"
    n_groups_per_k = tk // group_size
    n_groups = k // group_size
    scale3 = scale.reshape(n_groups, n)

    grid = (m // tm, n // tn, k // tk)
    return pl.pallas_call(
        functools.partial(_int8_matmul_kernel, n_groups_per_k=n_groups_per_k),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            # full K-group axis (too few rows per K tile for a legal block)
            pl.BlockSpec(
                (n_groups, tn),
                lambda i, j, kk: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + k * n + (k // group_size) * n * 4 + m * n * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, qw, scale3)


def _quant_matmul_xla(x, qp):
    from whisperx_tpu.quant.core import dequantize

    w = dequantize(qp, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def _on_tpu() -> bool:
    import os

    if os.environ.get("WHISPERX_TPU_NO_PALLAS_QUANT"):
        # force the XLA dequant-dot path (XLA also keeps int8 in HBM and
        # fuses the upcast into the dot; scheduling sometimes overlaps
        # better with neighbouring ops than the standalone kernel)
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def quant_matmul(x: jnp.ndarray, qp) -> jnp.ndarray:
    """Dispatch: Pallas fused kernel on TPU (int8, aligned shapes), XLA
    dequant-dot otherwise. ``x``: [..., K]; ``qp``: QuantizedLinear;
    returns [..., N]. bits/group_size are static pytree metadata, so this
    branch resolves at trace time."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    use_pallas = (
        _on_tpu()
        and qp.bits == 8
        and qp.qw.shape[1] % 128 == 0
        and k % qp.group_size == 0
        and _k_tile(k, qp.group_size) is not None
    )
    if use_pallas:
        # pad M to sublane multiple
        pad_m = (-m) % 8
        if pad_m:
            x2 = jnp.pad(x2, ((0, pad_m), (0, 0)))
        y = _quant_matmul_pallas_int8(x2, qp.qw, qp.scale, qp.group_size)
        if pad_m:
            y = y[:m]
    else:
        y = _quant_matmul_xla(x2, qp)
    return y.reshape(*lead, -1)
