"""Pallas kernel tests (interpret mode on CPU) vs XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.ops.flash_attention import (
    _flash_attention_pallas,
    _xla_attention,
    flash_attention,
)


def _qkv(bh=2, tq=128, tk=256, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((bh, tq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bh, tk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bh, tk, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_flash_kernel_matches_xla(causal):
    q, k, v = _qkv(tq=128, tk=128)
    ref = np.asarray(_xla_attention(q, k, v, causal=causal))
    out = np.asarray(
        _flash_attention_pallas(q, k, v, causal=causal, bq=64, bk=64, interpret=True)
    )
    # causal diagonal tiles exercise the online-softmax rescale with few
    # live elements → slightly noisier than the one-shot softmax oracle
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-2)


def test_flash_kernel_multi_kv_blocks():
    """Online-softmax recurrence across several kv tiles."""
    q, k, v = _qkv(bh=1, tq=64, tk=512, seed=1)
    ref = np.asarray(_xla_attention(q, k, v))
    out = np.asarray(
        _flash_attention_pallas(q, k, v, bq=64, bk=128, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_flash_attention_api_shape():
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((2, 64, 4, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 96, 4, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 96, 4, 32)), jnp.float32)
    out = flash_attention(q, k, v)  # CPU → XLA path
    assert out.shape == q.shape
    # rows are convex combinations of v: bounded by v's range
    assert float(jnp.abs(out).max()) <= float(jnp.abs(v).max()) + 1e-4


def test_wholek_kernel_matches_xla():
    """One-shot whole-K kernel (the encoder default on TPU) vs XLA."""
    from whisperx_tpu.ops.flash_attention import _flash_attention_wholek

    q, k, v = _qkv(bh=3, tq=256, tk=300, seed=4)
    ref = np.asarray(_xla_attention(q, k, v))
    out = np.asarray(_flash_attention_wholek(q, k, v, bq=128, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_wholek_kernel_ragged_q_blocks():
    """tq NOT a multiple of bq: the overhanging q rows are grid padding
    whose outputs must be dropped, not written into the result."""
    from whisperx_tpu.ops.flash_attention import _flash_attention_wholek

    q, k, v = _qkv(bh=2, tq=200, tk=256, seed=5)  # 200 = 128 + 72
    ref = np.asarray(_xla_attention(q, k, v))
    out = np.asarray(_flash_attention_wholek(q, k, v, bq=128, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("variant", ["skip_max", "mxu_sum"])
def test_wholek_softmax_variants_match_xla(variant):
    """exp2/VPU-economy variants: skip-max (no row-max pass) and mxu-sum
    (denominator from a ones column in the second dot) vs the XLA oracle."""
    from whisperx_tpu.ops.flash_attention import _flash_attention_wholek

    q, k, v = _qkv(bh=2, tq=200, tk=300, seed=6)
    ref = np.asarray(_xla_attention(q, k, v))
    out = np.asarray(
        _flash_attention_wholek(
            q, k, v, bq=128,
            skip_max=(variant == "skip_max"),
            mxu_sum=(variant == "mxu_sum"),
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_wholek_skip_max_large_logits_stay_finite():
    """skip_max works unstabilized: post-scale logits up to ~±50 (well above
    trained whisper's ~±30 and below the f32 exp2 bound ≈88) stay finite."""
    from whisperx_tpu.ops.flash_attention import _flash_attention_wholek

    q, k, v = _qkv(bh=1, tq=128, tk=128, seed=7)
    q = q * 10.0  # post-scale scores ~ N(0,10), extremes ≈ ±45
    ref = np.asarray(_xla_attention(q, k, v))
    out = np.asarray(
        _flash_attention_wholek(q, k, v, bq=128, skip_max=True, interpret=True)
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-3)


def test_quant_matmul_pallas_interpret():
    """Fused int8 dequant-matmul kernel vs the XLA dequant-dot oracle."""
    from jax.experimental.pallas import tpu as pltpu

    from whisperx_tpu.ops.quant_matmul import (
        _quant_matmul_pallas_int8,
        _quant_matmul_xla,
    )
    from whisperx_tpu.quant import make_quantized_linear

    rng = np.random.default_rng(3)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.1
    x = jnp.asarray(rng.standard_normal((8, 256)), jnp.float32)
    qp = make_quantized_linear(w, "int8", group_size=64)

    ref = np.asarray(_quant_matmul_xla(x, qp))
    out = np.asarray(
        _quant_matmul_pallas_int8(x, qp.qw, qp.scale, qp.group_size, interpret=True)
    )
    np.testing.assert_allclose(out, ref, atol=1e-2, rtol=1e-2)
