#!/usr/bin/env python
"""Encoder self-attention kernel shootout on the real chip (VERDICT #9).

Times, at whisper-encoder shape ([B*H, 1500, 64], bf16), the kernel ONLY
(projections excluded): the online-softmax flash kernel at several
(bq, bk), the whole-K-in-VMEM one-shot kernel at several bq, and plain
XLA attention. L pseudo-layers chained inside one jitted loop so
per-call dispatch amortizes (same harness discipline as
tools/probe_kv_layout.py; KV as jit ARGUMENTS, device-side generation).
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

    B = int(os.environ.get("BATCH", 8))
    H = int(os.environ.get("HEADS", 20))
    T = int(os.environ.get("SEQ", 1500))
    DH = int(os.environ.get("HEAD_DIM", 64))
    L = int(os.environ.get("LAYERS", 8))
    BH = B * H

    from whisperx_tpu.ops.flash_attention import (
        _flash_attention_pallas,
        _flash_attention_wholek,
        _xla_attention,
    )

    @jax.jit
    def gen(seed):
        return 0.1 * jax.random.normal(
            jax.random.PRNGKey(seed), (BH, T, DH), jnp.bfloat16
        )

    q0 = jax.block_until_ready(gen(0))
    ks = tuple(jax.block_until_ready(gen(2 * i + 1)) for i in range(L))
    vs = tuple(jax.block_until_ready(gen(2 * i + 2)) for i in range(L))

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    def chain(attn):
        @jax.jit
        def run(q, ks, vs):
            out = q
            for i in range(L):
                out = (q + 0.1 * attn(out, ks[i], vs[i]).astype(jnp.bfloat16)
                       ).astype(jnp.bfloat16)
            return out

        return run

    flops_layer = 4 * BH * T * T * DH  # qk + pv, 2 flops/mac
    modes = [("xla", lambda q, k, v: _xla_attention(q, k, v))]
    for bq, bk in [(256, 512), (512, 512), (512, 1536), (256, 1536)]:
        modes.append(
            (f"flash_bq{bq}_bk{bk}",
             lambda q, k, v, bq=bq, bk=bk: _flash_attention_pallas(
                 q, k, v, bq=bq, bk=bk))
        )
    for bq in (256, 512, 768, 1500):
        modes.append(
            (f"wholek_bq{bq}",
             lambda q, k, v, bq=bq: _flash_attention_wholek(q, k, v, bq=bq))
        )
    # VPU-economy variants (round 3 late): drop the row-max pass / move the
    # softmax denominator onto the MXU via a ones column
    for bq in (512, 768):
        modes.append(
            (f"wholek_skipmax_bq{bq}",
             lambda q, k, v, bq=bq: _flash_attention_wholek(
                 q, k, v, bq=bq, skip_max=True))
        )
        modes.append(
            (f"wholek_mxusum_bq{bq}",
             lambda q, k, v, bq=bq: _flash_attention_wholek(
                 q, k, v, bq=bq, mxu_sum=True))
        )

    results = {}
    for name, attn in modes:
        log(f"compiling+timing {name}...")
        try:
            t = timed(chain(attn), q0, ks, vs) / L
        except Exception as e:  # VMEM overflow etc — record and move on
            log(f"{name}: FAILED {type(e).__name__}")
            results[name] = {"error": type(e).__name__}
            continue
        tf = flops_layer / t / 1e12
        results[name] = {"ms_per_layer": round(t * 1000, 3),
                         "tflops": round(tf, 1)}
        log(f"{name}: {t*1000:.2f} ms/layer, {tf:.0f} TF/s")

    print(json.dumps({"bh": BH, "seq": T, "dh": DH, "layers": L, **results}))


if __name__ == "__main__":
    main()
