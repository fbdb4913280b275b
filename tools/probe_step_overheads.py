#!/usr/bin/env python
"""Decompose the decode-step gap: HBM traffic vs per-op launch overhead.

Round-2 truth: 8.03 ms/step at batch 16 (large-v3, int8 cross-KV) vs a
5.02 ms HBM floor. Before attempting a fused Pallas decoder-layer kernel
(VERDICT r2 #6), measure WHERE the 3 ms lives:

  step(full):   production shapes — cross 1500 frames int8, cache_len 192;
  step(tiny):   same program/op count, near-zero data — cross 64 frames,
                cache_len 64, weights unchanged (weights still stream, so
                subtract the weights-only floor);
  matmul-only:  the 12 weight matmuls alone (no LN/attention/elementwise)
                — isolates what a perfectly-fused layer could keep.

If step(tiny) - weights_floor is ~the 3 ms gap, the gap is launch/op
overhead and a fused layer kernel has a real target; if it is small, the
gap is attention/LN HBM traffic and the kernel should focus there.
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timed_loop(fn, args, steps=64, repeats=3):
    """Time `steps` sequential applications inside one jitted scan-like
    loop via lax.fori_loop to exclude per-call dispatch."""

    @jax.jit
    def run(x, args):
        def body(_, carry):
            return fn(carry, args)

        return jax.lax.fori_loop(0, steps, body, x)

    x0 = args["x0"]
    _sync(run(x0, args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(run(x0, args))
        best = min(best, time.perf_counter() - t0)
    return best / steps


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

    from whisperx_tpu.models.whisper import load_model
    from whisperx_tpu.models.whisper.model import (
        KVCache,
        decoder_forward,
        quantize_kv,
    )

    model = load_model(model_name)
    dims = model.dims
    params = model.params
    h, d = dims.n_text_head, dims.n_text_state
    dh = d // h
    rng = np.random.default_rng(0)

    def make_args(cross_len, cache_len):
        ck, cv = [], []
        sk, sv = [], []
        for _ in range(dims.n_text_layer):
            k = jnp.asarray(
                rng.standard_normal((batch, cross_len, h, dh)).astype(np.float32)
                * 0.1,
                model.dtype,
            )
            v = jnp.asarray(
                rng.standard_normal((batch, cross_len, h, dh)).astype(np.float32)
                * 0.1,
                model.dtype,
            )
            ck.append(quantize_kv(k))
            cv.append(quantize_kv(v))
            sk.append(jnp.zeros((batch, cache_len, h, dh), model.dtype))
            sv.append(jnp.zeros((batch, cache_len, h, dh), model.dtype))
        return KVCache(tuple(sk), tuple(sv), tuple(ck), tuple(cv))

    tok = jnp.zeros((batch, 1), jnp.int32)

    def step_fn(carry, cache):
        logits, _, _ = decoder_forward(params, carry, cache, jnp.int32(8), h)
        return jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)

    def time_step(cross_len, cache_len):
        cache = make_args(cross_len, cache_len)

        @jax.jit
        def run(tok, cache):
            def body(_, t):
                return step_fn(t, cache)

            return jax.lax.fori_loop(0, steps, body, tok)

        _sync(run(tok, cache))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(run(tok, cache))
            best = min(best, time.perf_counter() - t0)
        return best / steps * 1000  # ms

    full_ms = time_step(1500, 192)
    tiny_ms = time_step(64, 64)

    # weights-only floor: the 12 matmuls per layer over [B,1,D] inputs
    w = [
        jnp.asarray(rng.standard_normal((d, d)).astype(np.float32), model.dtype)
        for _ in range(4)
    ]
    w_mlp1 = jnp.asarray(
        rng.standard_normal((d, 4 * d)).astype(np.float32), model.dtype
    )
    w_mlp2 = jnp.asarray(
        rng.standard_normal((4 * d, d)).astype(np.float32), model.dtype
    )
    emb = jnp.asarray(
        rng.standard_normal((dims.n_vocab, d)).astype(np.float32), model.dtype
    )

    @jax.jit
    def matmuls_only(x):
        def layer(_, x):
            for wi in w:  # q, k, v, out (+ cross q, cross out ≈ reuse)
                x = x @ wi
            for wi in w[:2]:
                x = x @ wi
            hdn = x @ w_mlp1
            x = hdn @ w_mlp2
            return x / (jnp.max(jnp.abs(x)) + 1.0)

        def body(_, x):
            x = jax.lax.fori_loop(0, dims.n_text_layer, layer, x)
            logits = x @ emb.T
            return x + 0 * jnp.max(logits)

        return jax.lax.fori_loop(0, steps, body, x)

    x0 = jnp.asarray(
        rng.standard_normal((batch, 1, d)).astype(np.float32), model.dtype
    )
    _sync(matmuls_only(x0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(matmuls_only(x0))
        best = min(best, time.perf_counter() - t0)
    weights_ms = best / steps * 1000

    print(
        json.dumps(
            {
                "model": model_name,
                "batch": batch,
                "full_ms_per_step": round(full_ms, 3),
                "tiny_data_ms_per_step": round(tiny_ms, 3),
                "weights_matmuls_only_ms_per_step": round(weights_ms, 3),
                "launch_or_smallop_overhead_ms": round(tiny_ms - weights_ms, 3),
                "kv_traffic_ms": round(full_ms - tiny_ms, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
