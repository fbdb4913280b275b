"""Flash attention for TPU (Pallas) with an XLA fallback.

Counterpart of reference backends/mlx_flash_attention.py (tiled
online-softmax attention :83-162, threshold gating :71-75, sliding-window
variant :283-327) — but as a real fused-VMEM kernel instead of Python-level
tiling over framework ops.

Design: grid (batch*heads, Tq/BQ, Tk/BK); the k-axis is the innermost
(sequential) grid dimension, carrying running max / sum / accumulator in
VMEM scratch across its steps — the classic online-softmax recurrence. The
output block is written on the final k step. Optional causal masking skips
fully-masked tiles via predication.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
LOG2_E = math.log2(math.e)

# below this many score elements plain XLA attention wins (same instinct as
# the reference's 1M-element threshold, mlx_flash_attention.py:71-75)
FLASH_THRESHOLD_ELEMENTS = 1 << 20


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, causal, bq, bk):
    kv_idx = pl.program_id(2)
    q_idx = pl.program_id(1)

    @pl.when(kv_idx == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    run = True
    if causal:
        # tile fully in the future → skip
        run = (kv_idx * bk) <= (q_idx * bq + bq - 1)

    @pl.when(run if causal else True)
    def _():
        # scale×log2(e) folded into the [BQ,D] q block (23× fewer elements
        # than scaling [BQ,BK]); exp→exp2, the VPU's native transcendental
        q = (q_ref[:].astype(jnp.float32) * scale).astype(q_ref.dtype)  # [BQ, D]
        k = k_ref[:]  # [BK, D]
        v = v_ref[:]  # [BK, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK], log2 space

        if causal:
            q_pos = q_idx * bq + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
            k_pos = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)

        m_prev = m_ref[:]  # [BQ, 1]
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s - m_new)  # [BQ, BK]
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)

        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-20)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "bq", "bk", "interpret"))
def _flash_attention_pallas(q, k, v, causal=False, bq=256, bk=512, interpret=False):
    """q: [BH, Tq, D], k/v: [BH, Tk, D] → [BH, Tq, D]."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    bq = min(bq, tq)
    bk = min(bk, tk)
    scale = LOG2_E / math.sqrt(d)

    grid = (bh, pl.cdiv(tq, bq), pl.cdiv(tk, bk))
    return pl.pallas_call(
        functools.partial(
            _flash_kernel, scale=scale, causal=causal, bq=bq, bk=bk
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * d,
            bytes_accessed=2 * bh * (tq + 2 * tk) * d,
            transcendentals=bh * tq * tk,
        ),
        interpret=interpret,
    )(q, k, v)


def _wholek_kernel(q_ref, k_ref, v_ref, o_ref, *, kscale, skip_max):
    """One-shot softmax over the FULL key axis held in VMEM.

    For whisper-sized heads (Dh=64, Tk≤1500) K and V for one (b,h) are
    ~190 KB each — far under VMEM — so the online-softmax recurrence,
    its scratch traffic, and the 3-deep grid are pure overhead. Grid is
    (BH, Tq/bq); each program does two MXU dots and one row softmax.

    VPU economy (the kernel is VPU-bound: softmax passes over the
    [BQ,TK] score matrix dominate at Dh=64, tools/probe_flash.py):
    - the softmax scale × log2(e) is folded into the [BQ,D] q block
      (23× fewer elements than scaling [BQ,TK]) and exp → exp2, the
      VPU's native transcendental;
    - normalization divides the [BQ,D] output, not the [BQ,TK] weights;
    - skip_max drops the row-max stabilization pass entirely: f32
      overflows only when a post-scale logit exceeds 128/log2(e) ≈ 88
      (trained whisper attention logits sit well under ~30) — opt-in
      experiment, measured via tools/probe_flash.py.
    """
    q = (q_ref[0].astype(jnp.float32) * kscale).astype(q_ref.dtype)  # [BQ, D]
    k = k_ref[0]  # [TK, D]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, TK], already scaled, log2 space
    if skip_max:
        p = jnp.exp2(s)
    else:
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _wholek_mxusum_kernel(q_ref, k_ref, v_ref, o_ref, *, kscale, d):
    """Whole-K variant: softmax denominator comes out of the MXU.

    v arrives padded to [TK, 2D] with a ones column at index d; the
    second dot then yields [o | l] in one shot, trading one full-row VPU
    sum reduction over [BQ,TK] for extra MXU lanes (the dots are ~1 ms
    of the 5.2 ms layer, the VPU passes the rest — measured tradeoff,
    tools/probe_flash.py).
    """
    q = (q_ref[0].astype(jnp.float32) * kscale).astype(q_ref.dtype)
    k = k_ref[0]
    v = v_ref[0]  # [TK, 2D]; [:, :d]=v, [:, d]=1, rest 0
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    ol = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, 2D]
    o_ref[0] = (ol[:, :d] / ol[:, d:d + 1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bq", "skip_max", "mxu_sum", "interpret")
)
def _flash_attention_wholek(q, k, v, bq=512, skip_max=False, mxu_sum=False,
                            interpret=False):
    """q: [BH, Tq, D], k/v: [BH, Tk, D] → [BH, Tq, D]; non-causal only."""
    bh, tq, d = q.shape
    tk = k.shape[1]
    bq = min(bq, tq)
    kscale = LOG2_E / math.sqrt(d)
    grid = (bh, pl.cdiv(tq, bq))
    if mxu_sum:
        # ones column at index d; pad to 2D to keep the lane axis aligned
        v = jnp.concatenate(
            [v, jnp.ones((bh, tk, 1), v.dtype),
             jnp.zeros((bh, tk, d - 1), v.dtype)], axis=-1)
        kernel = functools.partial(_wholek_mxusum_kernel, kscale=kscale, d=d)
        v_width = 2 * d
    else:
        kernel = functools.partial(
            _wholek_kernel, kscale=kscale, skip_max=skip_max)
        v_width = d
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, v_width), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * tq * tk * d,
            bytes_accessed=2 * bh * (tq * 2 + tk * (d + v_width) // d) * d,
            transcendentals=bh * tq * tk,
        ),
        interpret=interpret,
    )(q, k, v)


def _xla_attention(q, k, v, causal=False):
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    s = s / math.sqrt(d)
    if causal:
        tq, tk = s.shape[-2:]
        mask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bqk,bkd->bqd", p, v)


def flash_attention(
    q: jnp.ndarray,  # [B, Tq, H, D]
    k: jnp.ndarray,  # [B, Tk, H, D]
    v: jnp.ndarray,
    causal: bool = False,
) -> jnp.ndarray:
    """Multi-head attention with automatic flash/XLA dispatch.

    Uses the Pallas kernel on TPU when the score matrix is large enough to
    be worth tiling; otherwise the plain fused XLA path.
    """
    b, tq, h, d = q.shape
    tk = k.shape[1]

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, -1, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    use_pallas = (
        jax.default_backend() != "cpu"
        and tq * tk >= FLASH_THRESHOLD_ELEMENTS
    )
    if use_pallas:
        # kernel shootout (tools/probe_flash.py, whisper encoder shape):
        # whole-K one-shot 5.2 ms/layer vs 7.3 for the old bq256/bk512
        # online-softmax tiling — K/V for one head fit VMEM easily at
        # Dh=64, so the recurrence and 3-deep grid were pure overhead.
        if not causal and tk <= 2048:
            out = _flash_attention_wholek(qb, kb, vb, bq=512)
        else:
            out = _flash_attention_pallas(qb, kb, vb, causal=causal, bq=512, bk=1536)
    else:
        out = _xla_attention(qb, kb, vb, causal=causal)
    return out.reshape(b, h, tq, d).transpose(0, 2, 1, 3)
