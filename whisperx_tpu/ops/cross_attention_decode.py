"""Fused cross-attention decode kernels (Pallas, TPU) — a MEASURED
NEGATIVE RESULT, kept as the experiment record.

The autoregressive decode step's dominant cost is streaming the int8
cross-attention K/V cache (~2 GB logical per step for large-v3 at batch
16).  Hypothesis: XLA's q_len=1 einsum runs the stream at ~420 GB/s
while a plain reduce over the same bytes hits ~950 GB/s, so a fused
kernel should reclaim ~2x.  Measured conclusion (tools/probe_kv_layout.py,
on-chip): the plateau is the MXU OPERAND-FEED rate (~450 G elem/s), not
HBM bandwidth and not the int8->bf16 upcast —

    sum(KV)                955 GB/s   (pure read)
    sum(upcast(KV))        871 GB/s   (read + VPU widen: NOT the limit)
    any dot over KV     ~420 GB/s   (bf16 / int8xint8 / transposed /
                                     packed / XLA / Pallas — all equal)

With q_len=1 every KV element costs exactly one MAC, so the feed rate is
the roofline; XLA's einsum already sits on it.  Three kernel variants
below (packed spread-q, transposed-K, true-int8 QK) all tie the einsum
in isolation and LOSE in the full decode program (12.53 vs 8.15 ms/step)
because the opaque pallas_call prevents XLA from overlapping weight DMAs
with the feed-bound attention stream.  The architectural answer to the
feed wall is speculative decoding (decoding/speculative.py): gamma
queries amortize one KV stream pass.

Kernel design notes (they tie the wall, which is still instructive):

- K/V are viewed PACKED as [B, T, D=H*Dh] int8 (a free reshape of the
  cache layout): minor dim = full 128-lanes, zero tile padding.
- Per-head scores come from ONE MXU matmul per tile via a block-diagonal
  "spread" of the query: qsT[h, :] is the packed query masked to head
  h's Dh-block, so  s[h, t] = K[t, :] . qsT[h, :]  is exactly the
  per-head dot product.
- Online softmax over T tiles (same recurrence as ops/flash_attention.py)
  in a [H, *] orientation so running max / denominator broadcast along
  lanes; the packed output is recovered by the same block-diagonal mask.

K channel scales (and 1/sqrt(dh)) are folded into the query by the
caller, V channel scales are applied to the output by the caller — the
kernels only ever touch int8 K/V, exactly like the XLA path
(models/whisper/model.py int8 branch).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")


def _kernel(qs_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, t_total, bt):
    """Grid (B, cdiv(T, bt)); the T axis is innermost/sequential.

    qs_ref: [1, H, D] bf16 spread queries   k_ref/v_ref: [1, bt, D] int8
    o_ref:  [1, 1, D] f32                   scratch: m/l [H,1], acc [H,D] f32
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qs = qs_ref[0]  # [H, D] bf16
    kb = k_ref[0].astype(jnp.bfloat16)  # [bt, D]
    # s[h, t] = sum_d K[t, d] * qs[h, d] — per-head scores in one matmul
    s = jax.lax.dot_general(
        qs, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [H, bt]

    # mask lanes beyond the true T (the last tile may overhang; K/V are
    # int8 so out-of-bounds garbage is finite and exp(-inf)=0 kills it)
    t_pos = t_idx * bt + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_pos < t_total, s, NEG_INF)

    m_prev = m_ref[:]  # [H, 1]
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # [H, bt]
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new

    vb = v_ref[0].astype(jnp.bfloat16)  # [bt, D]
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, D]

    @pl.when(t_idx == pl.num_programs(1) - 1)
    def _():
        h, d = acc_ref.shape
        out_all = acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)  # [H, D]
        # heads own disjoint Dh-blocks of the packed D axis: select
        # out[d] = out_all[head(d), d] via a masked sublane-reduce
        dh = d // h
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 1)
        sel = (d_ids // dh) == h_ids
        o_ref[0] = jnp.sum(
            jnp.where(sel, out_all, 0.0), axis=0, keepdims=True
        )


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def _cross_decode_pallas(qs, k8, v8, bt=512, interpret=False):
    """qs: [B, H, D] bf16 spread queries; k8/v8: [B, T, D] int8 → [B, D] f32."""
    b, h, d = qs.shape
    t = k8.shape[1]
    bt = min(bt, t)
    grid = (b, pl.cdiv(t, bt))
    return pl.pallas_call(
        functools.partial(_kernel, t_total=t, bt=bt),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * d * h,
            bytes_accessed=2 * b * t * d + b * h * d * 2 + b * d * 4,
            transcendentals=b * h * t,
        ),
        interpret=interpret,
    )(qs, k8, v8)


def _kernel_kt(qs_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, t_total, bt):
    """Transposed-K variant: k_ref is [1, D, bt] so the score contraction
    runs over K's MAJOR dim — no MXU-feed transpose of the streamed tile.
    (The [bt, D] layout measured ~250 GB/s on the QK side purely from the
    per-tile transpose; this layout restores near-ceiling streaming.)
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qs = qs_ref[0]  # [H, D] bf16
    kb = k_ref[0].astype(jnp.bfloat16)  # [D, bt]
    s = jax.lax.dot_general(
        qs, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [H, bt]

    t_pos = t_idx * bt + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_pos < t_total, s, NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new

    vb = v_ref[0].astype(jnp.bfloat16)  # [bt, D]
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t_idx == pl.num_programs(1) - 1)
    def _():
        h, d = acc_ref.shape
        out_all = acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)
        dh = d // h
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 1)
        sel = (d_ids // dh) == h_ids
        o_ref[0] = jnp.sum(jnp.where(sel, out_all, 0.0), axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def _cross_decode_pallas_kt(qs, kt8, v8, bt=512, interpret=False):
    """qs: [B, H, D] bf16; kt8: [B, D, T] int8; v8: [B, T, D] int8 → [B,1,D] f32."""
    b, h, d = qs.shape
    t = kt8.shape[2]
    bt = min(bt, t)
    grid = (b, pl.cdiv(t, bt))
    return pl.pallas_call(
        functools.partial(_kernel_kt, t_total=t, bt=bt),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, bt), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * d * h,
            bytes_accessed=2 * b * t * d + b * h * d * 2 + b * d * 4,
            transcendentals=b * h * t,
        ),
        interpret=interpret,
    )(qs, kt8, v8)


def _kernel_i8(
    qs_ref, sq_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, t_total, bt
):
    """int8-QK variant: scores come from a TRUE int8xint8 MXU dot with
    int32 accumulation — the K stream is never widened by the VPU.
    qs_ref: [1, H, D] int8 (per-head-quantized spread queries),
    sq_ref: [1, H, 1] f32 per-head query scales.
    """
    t_idx = pl.program_id(1)

    @pl.when(t_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    qs = qs_ref[0]  # [H, D] int8
    s32 = jax.lax.dot_general(
        qs, k_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # [H, bt]
    s = s32.astype(jnp.float32) * sq_ref[0]  # [H,1] scale broadcasts

    t_pos = t_idx * bt + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(t_pos < t_total, s, NEG_INF)

    m_prev = m_ref[:]
    l_prev = l_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
    m_ref[:] = m_new

    vb = v_ref[0].astype(jnp.bfloat16)  # [bt, D]
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(t_idx == pl.num_programs(1) - 1)
    def _():
        h, d = acc_ref.shape
        out_all = acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)
        dh = d // h
        h_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
        d_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 1)
        sel = (d_ids // dh) == h_ids
        o_ref[0] = jnp.sum(jnp.where(sel, out_all, 0.0), axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("bt", "interpret"))
def _cross_decode_pallas_i8(qs8, sq, k8, v8, bt=512, interpret=False):
    """qs8: [B, H, D] int8; sq: [B, H, 1] f32; k8/v8: [B, T, D] int8."""
    b, h, d = qs8.shape
    t = k8.shape[1]
    bt = min(bt, t)
    grid = (b, pl.cdiv(t, bt))
    return pl.pallas_call(
        functools.partial(_kernel_i8, t_total=t, bt=bt),
        out_shape=jax.ShapeDtypeStruct((b, 1, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, 1), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * t * d * h,
            bytes_accessed=2 * b * t * d + b * h * d + b * d * 4,
            transcendentals=b * h * t,
        ),
        interpret=interpret,
    )(qs8, sq, k8, v8)


def use_cross_decode_kernel() -> bool:
    """Default OFF (measured negative result): the q_len=1 attention is
    MXU-feed-bound at ~420 GB/s and XLA's einsum already sits at that
    wall; in the full decode program this kernel is SLOWER (12.53 vs
    8.15 ms/step, large-v3 batch 16) because the opaque pallas_call
    blocks XLA from overlapping weight DMAs with the feed-bound stream.
    Kept as the measured experiment (docs/PERFORMANCE.md negative
    results; tools/probe_kv_layout.py for the methodology).
    WHISPERX_TPU_CROSS_DECODE=1 opts in on TPU, =force enables on CPU
    (interpret mode — integration tests only)."""
    flag = os.environ.get("WHISPERX_TPU_CROSS_DECODE", "0")
    if flag == "force":
        return True
    return flag == "1" and jax.default_backend() != "cpu"


def cross_attention_decode(
    q_eff: jnp.ndarray,  # [B, 1, H, Dh] — K scales + 1/sqrt(dh) pre-folded
    k8: jnp.ndarray,  # [B, T, H, Dh] int8
    v8: jnp.ndarray,  # [B, T, H, Dh] int8
    interpret: bool = False,
) -> jnp.ndarray:
    """softmax(q_eff . k8^T) @ v8 for a single decode step → [B, 1, H, Dh] f32.

    The caller applies the V channel scales to the result (they broadcast
    over the packed layout unchanged).
    """
    b, one, h, dh = q_eff.shape
    assert one == 1, "decode kernel handles q_len=1 only"
    d = h * dh
    t = k8.shape[1]
    if jax.default_backend() == "cpu":
        interpret = True  # no Mosaic on CPU; tests exercise the same path
    q_pack = q_eff.reshape(b, d).astype(jnp.bfloat16)
    h_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 0)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (h, d), 1)
    spread = ((d_ids // dh) == h_ids).astype(jnp.bfloat16)  # [H, D]
    qs = q_pack[:, None, :] * spread[None]  # [B, H, D]
    out = _cross_decode_pallas(
        qs, k8.reshape(b, t, d), v8.reshape(b, t, d), interpret=interpret
    )
    return out.reshape(b, 1, h, dh)
