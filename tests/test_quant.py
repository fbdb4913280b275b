"""Weight-only quantization tests (XLA path on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from whisperx_tpu.quant import (
    QuantConfig,
    QuantizedLinear,
    dequantize,
    make_quantized_linear,
    quant_linear_apply,
    quantize_tree,
)


@pytest.mark.parametrize("mode,tol", [("int8", 0.01), ("int4", 0.12)])
def test_quantize_dequantize_roundtrip(mode, tol):
    rng = np.random.default_rng(0)
    w = rng.standard_normal((128, 256)).astype(np.float32)
    qp = make_quantized_linear(w, mode, group_size=64)
    w2 = np.asarray(dequantize(qp, dtype=jnp.float32))
    err = np.abs(w - w2).max() / np.abs(w).max()
    assert err < tol, f"{mode} roundtrip rel err {err}"


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_quant_linear_matches_fp(mode):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((128, 64)).astype(np.float32) * 0.1
    x = rng.standard_normal((4, 128)).astype(np.float32)
    qp = make_quantized_linear(w, mode, group_size=64, b=jnp.zeros((64,), jnp.float32))
    y_q = np.asarray(quant_linear_apply(qp, jnp.asarray(x)))
    y_fp = x @ w
    rel = np.abs(y_q - y_fp).max() / (np.abs(y_fp).max() + 1e-9)
    assert rel < (0.02 if mode == "int8" else 0.15)


def test_quantize_tree_policy():
    rng = np.random.default_rng(2)
    params = {
        "conv1": {"w": jnp.asarray(rng.standard_normal((3, 80, 64)), jnp.float32)},
        "blocks": [
            {
                "mlp1": {
                    "w": jnp.asarray(rng.standard_normal((128, 512)), jnp.float32),
                    "b": jnp.zeros((512,)),
                }
            }
        ],
        "tiny": {"w": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)},
    }
    q = quantize_tree(params, QuantConfig(mode="int8", group_size=64))
    assert isinstance(q["blocks"][0]["mlp1"], QuantizedLinear)  # big linear quantized
    assert "w" in q["conv1"]  # conv skipped
    assert "w" in q["tiny"]  # tiny matrix skipped


def test_quantized_checkpoint_roundtrip(tmp_path, nano_model):
    """QuantizedLinear layers survive save_checkpoint/load_checkpoint."""
    from whisperx_tpu.convert.checkpoint import load_checkpoint, save_checkpoint
    from whisperx_tpu.quant import quantize_model

    qm = quantize_model(nano_model, mode="int8")
    path = str(tmp_path / "qckpt")
    save_checkpoint(path, qm.params, {"dims": nano_model.dims.__dict__})
    params2, _ = load_checkpoint(path, dtype=jnp.bfloat16)

    ql_orig = qm.params["decoder"]["blocks"][0]["mlp1"]
    ql_new = params2["decoder"]["blocks"][0]["mlp1"]
    assert isinstance(ql_new, QuantizedLinear)
    assert ql_new.bits == ql_orig.bits
    assert ql_new.group_size == ql_orig.group_size
    np.testing.assert_array_equal(np.asarray(ql_new.qw), np.asarray(ql_orig.qw))
    np.testing.assert_allclose(
        np.asarray(ql_new.scale), np.asarray(ql_orig.scale), atol=1e-7
    )


def test_quantized_model_decodes(nano_model):
    from whisperx_tpu.decoding import DecodingOptions, decode
    from whisperx_tpu.quant import quantize_model

    qmodel = quantize_model(nano_model, mode="int8")
    mel = jnp.zeros((3000, nano_model.dims.n_mels), jnp.float32)
    res = decode(qmodel, mel, DecodingOptions(language="en", sample_len=6))
    assert isinstance(res.tokens, list)


def test_first_last_decoder_blocks_stay_fp_at_depth():
    """Reference accuracy policy (mlx_quantization.py:316-352): at
    production depth the first and last decoder blocks keep full
    precision; middle blocks are quantized."""
    rng = np.random.default_rng(3)

    def linear():
        return {
            "w": jnp.asarray(rng.standard_normal((128, 256)), jnp.float32),
            "b": jnp.zeros((256,)),
        }

    params = {"decoder": {"blocks": [{"mlp1": linear()} for _ in range(4)]}}
    q = quantize_tree(params, QuantConfig(mode="int8", group_size=64))
    assert "w" in q["decoder"]["blocks"][0]["mlp1"]  # first stays fp
    assert "w" in q["decoder"]["blocks"][3]["mlp1"]  # last stays fp
    assert isinstance(q["decoder"]["blocks"][1]["mlp1"], QuantizedLinear)
    assert isinstance(q["decoder"]["blocks"][2]["mlp1"], QuantizedLinear)

    # shallow trees (test configs) quantize everything
    shallow = {"decoder": {"blocks": [{"mlp1": linear()} for _ in range(2)]}}
    qs = quantize_tree(shallow, QuantConfig(mode="int8", group_size=64))
    assert isinstance(qs["decoder"]["blocks"][0]["mlp1"], QuantizedLinear)
