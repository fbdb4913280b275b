#!/usr/bin/env python
"""Decode-step profiling on the real chip, mirroring the production path.

Reports, for MODEL/BATCH (env):
  - encoder + cross-KV precompute time (one dispatch each);
  - per-step decode time measured INSIDE one device-side loop (the true
    step cost — no per-call dispatch);
  - per-call dispatch overhead (one-step jit call minus in-loop step);
  - the HBM bandwidth floor implied by the working set, for comparison.

KV_QUANT=1 profiles with the int8 cross-KV cache (the production
default). The cache is allocated to the decode budget like
decoding/decode.py::init_kv_cache_like, not the full n_text_ctx.
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


def _sync(out):
    """Materialize on host — through the device tunnel,
    ``block_until_ready`` can return before execution completes; a
    device_get is the only reliable barrier."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timed(fn, *args, n=3, **kw):
    _sync(fn(*args, **kw))  # compile + warm
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _sync(fn(*args, **kw))
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
    batch = int(os.environ.get("BATCH", 16))
    steps = int(os.environ.get("STEPS", 64))
    kv_quant = os.environ.get("KV_QUANT", "1") == "1"

    from whisperx_tpu.models.whisper import load_model
    from whisperx_tpu.models.whisper.model import (
        KVCache,
        decoder_forward,
        encoder_forward,
        precompute_cross_kv,
    )

    model = load_model(model_name)
    dims = model.dims
    n_head = dims.n_text_head
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((batch, 3000, dims.n_mels)) * 0.1, jnp.bfloat16
    )

    enc = jax.jit(lambda p, m: encoder_forward(p, m, dims.n_audio_head))
    t_enc = timed(enc, model.params, mel)
    feats = enc(model.params, mel)

    def make_cross(p, f):
        ck, cv = precompute_cross_kv(p, f, n_head)
        if kv_quant:
            from whisperx_tpu.models.whisper.model import quantize_kv

            ck = tuple(quantize_kv(x) for x in ck)
            cv = tuple(quantize_kv(x) for x in cv)
        return ck, cv

    ckv = jax.jit(make_cross)
    t_ckv = timed(ckv, model.params, feats)
    ck, cv = ckv(model.params, feats)

    # production-style budgeted self cache (decode.py::init_kv_cache_like)
    cache_len = -(-(4 + steps + 1) // 64) * 64
    d = dims.n_text_state
    shape = (batch, cache_len, n_head, d // n_head)
    sk = tuple(jnp.zeros(shape, jnp.bfloat16) for _ in range(dims.n_text_layer))
    sv = tuple(jnp.zeros(shape, jnp.bfloat16) for _ in range(dims.n_text_layer))

    # cross-KV must be a jit ARGUMENT — closing over the ~2 GB device
    # arrays embeds them as compile-time constants and the compile hangs
    def one_step_fn(p, self_kv, cross, tok, off):
        cache = KVCache(self_kv[0], self_kv[1], cross[0], cross[1])
        logits, cache, _ = decoder_forward(p, tok, cache, off, n_head)
        return logits[:, -1], (cache.self_k, cache.self_v)

    one_step = jax.jit(one_step_fn)
    tok1 = jnp.zeros((batch, 1), jnp.int32)
    t_call = timed(one_step, model.params, (sk, sv), (ck, cv), tok1, jnp.int32(0))

    @jax.jit
    def loop_steps(p, self_kv, cross, tok0):
        def body(c):
            i, tok, kv, acc = c
            logits, kv = one_step_fn(p, kv, cross, tok, i)
            nxt = jnp.argmax(logits, -1).astype(jnp.int32)[:, None]
            return (i + 1, nxt, kv, acc + logits[0, 0])
        out = jax.lax.while_loop(
            lambda c: c[0] < steps, body, (jnp.int32(0), tok0, self_kv, jnp.float32(0))
        )
        return out[3]

    t_loop = timed(loop_steps, model.params, (sk, sv), (ck, cv), tok1, n=2)
    per_step = t_loop / steps

    # HBM floor: decoder weights + cross-KV + self-KV reads per step
    p_dec = sum(
        x.size for x in jax.tree_util.tree_leaves(model.params["decoder"])
    )
    w_bytes = p_dec * 2
    cross_bytes = 2 * dims.n_text_layer * batch * 1500 * d * (1 if kv_quant else 2)
    self_bytes = 2 * dims.n_text_layer * batch * cache_len * d * 2
    floor_ms = (w_bytes + cross_bytes + self_bytes) / 819e9 * 1000

    report = {
        "model": model_name,
        "batch": batch,
        "kv_quant": kv_quant,
        "encoder_s": round(t_enc, 4),
        "cross_kv_s": round(t_ckv, 4),
        "one_step_call_ms": round(t_call * 1000, 2),
        "per_step_in_loop_ms": round(per_step * 1000, 2),
        "dispatch_overhead_ms": round((t_call - per_step) * 1000, 2),
        "hbm_floor_ms": round(floor_ms, 2),
        "step_vs_floor": round(per_step * 1000 / floor_ms, 2),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
