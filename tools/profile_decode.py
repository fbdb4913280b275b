#!/usr/bin/env python
"""Stage-level profiling of the batched decode path on the real chip."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=3, **kw):
    fn(*args, **kw)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import functools
    import os

    model_name = os.environ.get("MODEL", "large-v3")
    batch = int(os.environ.get("BATCH", 8))
    steps = int(os.environ.get("STEPS", 32))

    from whisperx_tpu.models.whisper import load_model
    from whisperx_tpu.models.whisper.model import (
        KVCache,
        decoder_forward,
        encoder_forward,
        init_kv_cache,
        precompute_cross_kv,
    )

    model = load_model(model_name)
    dims = model.dims
    rng = np.random.default_rng(0)
    mel = jnp.asarray(
        rng.standard_normal((batch, 3000, dims.n_mels)) * 0.1, jnp.bfloat16
    )

    enc = jax.jit(
        lambda p, m: encoder_forward(p, m, dims.n_audio_head)
    )
    t_enc = timed(enc, model.params, mel)
    feats = enc(model.params, mel)

    ckv = jax.jit(
        lambda p, f: precompute_cross_kv(p, f, dims.n_text_head)
    )
    t_ckv = timed(ckv, model.params, feats)
    ck, cv = ckv(model.params, feats)

    sk, sv = init_kv_cache(dims, batch, jnp.bfloat16)
    cache = KVCache(sk, sv, ck, cv)
    tokens = jnp.zeros((batch, 4), jnp.int32)

    prefill = jax.jit(
        lambda p, t, c: decoder_forward(p, t, c, jnp.int32(0), dims.n_text_head)[:2]
    )
    t_prefill = timed(prefill, model.params, tokens, cache)
    _, cache = prefill(model.params, tokens, cache)

    @jax.jit
    def run_steps(p, c, tok0):
        def body(i, carry):
            tok, c = carry
            logits, c, _ = decoder_forward(p, tok, c, 4 + i, dims.n_text_head)
            nxt = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)[:, None]
            return nxt, c
        tok, c = jax.lax.fori_loop(0, steps, body, (tok0, c))
        return tok

    tok0 = jnp.zeros((batch, 1), jnp.int32)
    t_steps = timed(run_steps, model.params, cache, tok0, n=2)

    report = {
        "model": model_name,
        "batch": batch,
        "encoder_s": round(t_enc, 4),
        "cross_kv_s": round(t_ckv, 4),
        "prefill4_s": round(t_prefill, 4),
        f"decode_{steps}steps_s": round(t_steps, 4),
        "per_step_ms": round(1000 * t_steps / steps, 3),
        "per_chunk_128tok_s_est": round(
            t_enc / batch * batch + t_ckv + 128 * t_steps / steps, 3
        ),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
