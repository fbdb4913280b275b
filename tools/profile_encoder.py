#!/usr/bin/env python
"""Encoder utilization breakdown on the real chip (VERDICT #9).

Times, for MODEL/BATCH (env), each encoder stage as its own jitted
program over device-resident inputs:
  - conv stem (conv1 + gelu + conv2 + gelu + pos_emb)
  - full block stack, with flash attention on and off
  - attention sublayers only / MLP sublayers only (x n_layer)
and reports achieved model-FLOPs utilization vs the bf16 peak.

Like tools/profile_decode.py: sync via device_get (block_until_ready is
not a reliable barrier through the tunnel), persistent XLA cache, best
of N.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys

# Run-from-anywhere: the in-tree package is the subject under test.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

PEAK_BF16_TFLOPS = float(os.environ.get("PEAK_TFLOPS", 197.0))  # v5e-class


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timed(fn, *args, n=3):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    try:
        cache_dir = os.path.expanduser("~/.cache/whisperx_tpu/xla_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    model_name = os.environ.get("MODEL", "large-v3")
    batch = int(os.environ.get("BATCH", 8))

    from whisperx_tpu.models.whisper import load_model
    from whisperx_tpu.models.whisper.model import (
        _conv1d,
        _encoder_block,
        encoder_forward,
        layer_norm,
        linear,
    )

    model = load_model(model_name)
    params, dims = model.params, model.dims
    enc = params["encoder"]
    h = dims.n_audio_head
    d = dims.n_audio_state
    t = dims.n_audio_ctx  # 1500
    n_layer = dims.n_audio_layer

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    @jax.jit
    def gen_mel(seed):
        return 0.1 * jax.random.normal(
            jax.random.PRNGKey(seed), (batch, 2 * t, dims.n_mels), jnp.bfloat16
        )

    @jax.jit
    def gen_x(seed):
        return 0.1 * jax.random.normal(
            jax.random.PRNGKey(seed), (batch, t, d), jnp.bfloat16
        )

    mel = jax.block_until_ready(gen_mel(0))
    x0 = jax.block_until_ready(gen_x(1))

    # params are ALWAYS jit arguments — closing a jit over GB-scale device
    # arrays embeds them as compile-time constants and compilation hangs
    # (same trap as tools/profile_decode.py / probe_kv_layout.py).
    @jax.jit
    def full(p, mel):
        return encoder_forward(p, mel, h)

    @jax.jit
    def stem(p, mel):
        e = p["encoder"]
        x = jax.nn.gelu(_conv1d(e["conv1"], mel, stride=1))
        x = jax.nn.gelu(_conv1d(e["conv2"], x, stride=2))
        return x + e["pos_emb"][None, : x.shape[1]]

    @jax.jit
    def blocks(p, x):
        for blk in p["encoder"]["blocks"]:
            x = _encoder_block(blk, x, h)
        return x

    @jax.jit
    def attn_only(p, x):
        from whisperx_tpu.models.whisper.model import (
            _merge_heads,
            _split_heads,
            _use_flash_attention,
            qkv_attention,
        )
        from whisperx_tpu.ops.flash_attention import flash_attention

        for blk in p["encoder"]["blocks"]:
            hh = layer_norm(blk["attn_ln"], x)
            q = _split_heads(linear(blk["attn"]["query"], hh), h)
            k = _split_heads(linear(blk["attn"]["key"], hh), h)
            v = _split_heads(linear(blk["attn"]["value"], hh), h)
            if _use_flash_attention():
                a = flash_attention(q, k, v)
            else:
                a, _ = qkv_attention(q, k, v)
            x = x + linear(blk["attn"]["out"], _merge_heads(a))
        return x

    @jax.jit
    def mlp_only(p, x):
        for blk in p["encoder"]["blocks"]:
            hh = layer_norm(blk["mlp_ln"], x)
            hh = jax.nn.gelu(linear(blk["mlp1"], hh))
            x = x + linear(blk["mlp2"], hh)
        return x

    # model FLOPs (fwd, 2 flops per MAC)
    f_lin_layer = 2 * t * d * d * 4 + 2 * t * d * 4 * d * 2  # qkvo + mlp
    f_attn_layer = 2 * t * t * d * 2  # scores + pv
    f_blocks = batch * n_layer * (f_lin_layer + f_attn_layer)
    f_stem = batch * (2 * 2 * t * 3 * dims.n_mels * d + 2 * t * 3 * d * d)
    f_full = f_blocks + f_stem

    results = {}
    for name, fn, arg, flops in [
        ("full_encoder", full, mel, f_full),
        ("conv_stem", stem, mel, f_stem),
        ("blocks", blocks, x0, f_blocks),
        ("attn_sublayers", attn_only, x0,
         batch * n_layer * (2 * t * d * d * 4 + f_attn_layer)),
        ("mlp_sublayers", mlp_only, x0, batch * n_layer * 2 * t * d * 4 * d * 2),
    ]:
        log(f"compiling+timing {name}...")
        s = timed(fn, params, arg)
        tflops = flops / s / 1e12
        results[name] = {
            "ms": round(s * 1000, 2),
            "tflops": round(tflops, 1),
            "mxu_util": round(tflops / PEAK_BF16_TFLOPS, 3),
        }
        log(f"{name}: {s*1000:.1f} ms, {tflops:.1f} TF/s "
            f"({100*tflops/PEAK_BF16_TFLOPS:.0f}% of peak)")

    print(json.dumps({
        "model": model_name, "batch": batch,
        "peak_tflops": PEAK_BF16_TFLOPS, **results,
    }))


if __name__ == "__main__":
    main()
