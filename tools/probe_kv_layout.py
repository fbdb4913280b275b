#!/usr/bin/env python
"""Cross-attention decode roofline probe (CONCLUSION: MXU-feed-bound).

Measured on-chip 2026-08-17 (batch 16, T=1500, H=20, Dh=64, int8 KV,
8 pseudo-layers, 64 steps in one device loop):

    sum_ceiling   955 GB/s   pure read+reduce of the KV stream
    upcast_sum    871 GB/s   + int8->bf16 VPU widen (not the limit)
    qk_int8       280 GB/s   K-only int8xint8 MXU dot (int32 accum)
    per_head      ~420 GB/s  production XLA einsum (bf16 dot)
    per_head_kT   ~418 GB/s  K stored transposed (no feed transpose)
    packed        ~350 GB/s  [B,T,D] spread-q XLA formulation
    pallas_*      ~410 GB/s  all Pallas kernel variants (ops/cross_
                             attention_decode.py: packed / kT / int8)

Every DOT over the stream plateaus at ~420 GB/s (~450 G elem/s) no
matter the dtype, layout, or engine: with q_len=1 the MXU operand-feed
rate is the roofline, and XLA's einsum already sits on it.  Fixes that
do NOT work: transposing K, packing [B,T,D], int8 MXU dots, Pallas
fusion.  What works: more queries per stream pass — speculative
decoding (decoding/speculative.py).

Original hypothesis below, kept for the record (it was wrong: tile
padding was not the issue).

---

Measure whether the KV-cache layout [B, T, H, Dh] pays TPU tile padding.

Hypothesis: with H=20, Dh=64 as the two minor dims, Mosaic/XLA tiling pads
Dh 64->128 (lanes) and H 20->32 (int8 sublanes), so the decode step's
dominant HBM read (cross-attention int8 KV, ~2 GB/step at batch 16) may
actually move 2-3x the logical bytes. The packed alternative stores KV as
[B, T, D=H*Dh] (minor dim 1280 = 10 full lanes, zero padding) and computes
per-head attention with a masked-spread matmul:

  scores[b,h,t] = sum_d K[b,t,d] * Qs[b,d,h]   with Qs[b, h*Dh+i, h'] =
                  q[b,h,i] * (h==h')            (block-diagonal spread)

H x more MXU FLOPs (1500x1280x20 vs per-head 1500x64x20) but the step is
bandwidth-bound: FLOPs are ~free, the K read is what matters. Same trick
for the output: out_all = P @ V  ([H,T]@[T,D]) then take the h-th 64-block
of row h.

Reports per-"step" times for both layouts over L pseudo-layers and the
implied HBM bandwidth, on the real chip.
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

    B = int(os.environ.get("BATCH", 16))
    T = int(os.environ.get("CROSS_LEN", 1500))
    H = int(os.environ.get("HEADS", 20))
    DH = int(os.environ.get("HEAD_DIM", 64))
    L = int(os.environ.get("LAYERS", 8))
    STEPS = int(os.environ.get("STEPS", 4))
    D = H * DH

    rng = np.random.default_rng(0)

    # one K + one V per layer, int8 (the production cross-KV dtype) —
    # generated ON DEVICE (a 3 GB host upload takes minutes through the
    # tunnel; the values don't matter for a bandwidth probe)
    @jax.jit
    def gen(seed):
        x = jax.random.randint(
            jax.random.PRNGKey(seed), (B, T, H, DH), -127, 127, jnp.int32
        )
        return x.astype(jnp.int8)

    def log(msg):
        print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    pack = jax.jit(lambda x: x.reshape(B, T, D))
    log("generating KV on device...")
    k4 = [jax.block_until_ready(gen(2 * i)) for i in range(L)]
    v4 = [jax.block_until_ready(gen(2 * i + 1)) for i in range(L)]
    log("packing...")
    kp = [jax.block_until_ready(pack(x)) for x in k4]
    vp = [jax.block_until_ready(pack(x)) for x in v4]
    log("generated")

    q0 = jnp.asarray(
        rng.standard_normal((B, 1, H, DH)).astype(np.float32) * 0.1, jnp.bfloat16
    )

    def attn_per_head(q, ks, vs):
        """Current production shape: einsum over [B,T,H,Dh] int8 KV."""
        out = q
        for i in range(L):
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk",
                out,
                ks[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            w = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd",
                w.astype(jnp.bfloat16),
                vs[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            out = (q + 1e-3 * o).astype(jnp.bfloat16)
        return out

    eye_spread = jnp.einsum(
        "hg,ij->higj", jnp.eye(H, dtype=jnp.bfloat16), jnp.eye(DH, dtype=jnp.bfloat16)
    ).reshape(H, DH, H * DH)  # [H, DH, D]: spread head h's Dh slice to rows h*DH+i

    def attn_packed(q, ks, vs):
        """Packed [B,T,D] KV; block-diagonal spread of q; H x extra FLOPs."""
        out = q  # [B, 1, H, DH]
        for i in range(L):
            # Qs[b, d, h]: block-diagonal spread of q
            qs = jnp.einsum(
                "bqhd,hdD->bDh", out, eye_spread, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)  # [B, D, H]
            scores = jnp.einsum(
                "btd,bdh->bht",
                ks[i].astype(jnp.bfloat16),
                qs,
                preferred_element_type=jnp.float32,
            )  # [B, H, T]
            w = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            o_all = jnp.einsum(
                "bht,btd->bhd",
                w,
                vs[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # [B, H, D] — need the h-th DH block of row h
            o = jnp.einsum(
                "bhD,hdD->bhd", o_all.astype(jnp.bfloat16), eye_spread,
                preferred_element_type=jnp.float32,
            )  # [B, H, DH]
            out = (q + 1e-3 * o[:, None]).astype(jnp.bfloat16)
        return out

    def loop(fn):
        # KV MUST be jit arguments — closing over GB-scale device arrays
        # embeds them as compile-time constants and the compile hangs
        # (same trap documented in tools/profile_decode.py).
        @jax.jit
        def run(q, ks, vs):
            def body(_, t):
                return fn(t, ks, vs)

            return jax.lax.fori_loop(0, STEPS, body, q)

        return run

    logical_gb = 2 * L * B * T * D / 1e9  # int8 K+V per step

    def sum_all(q, ks, vs):
        """Pure-bandwidth ceiling: reduce every KV byte, no attention."""
        acc = jnp.float32(0)
        for i in range(L):
            acc = acc + jnp.sum(ks[i].astype(jnp.int32)) + jnp.sum(
                vs[i].astype(jnp.int32)
            )
        return q + 1e-12 * acc.astype(jnp.bfloat16)

    def upcast_sum(q, ks, vs):
        """sum_ceiling + the int8→bf16 upcast every attention variant pays:
        isolates whether the VPU widening pass is what halves throughput."""
        acc = jnp.float32(0)
        for i in range(L):
            acc = acc + jnp.sum(ks[i].astype(jnp.bfloat16).astype(jnp.float32))
            acc = acc + jnp.sum(vs[i].astype(jnp.bfloat16).astype(jnp.float32))
        return q + 1e-12 * acc.astype(jnp.bfloat16)

    def qk_int8(q, ks, vs):
        """Scores via a TRUE int8xint8 MXU dot (int32 accum): no upcast of
        the K stream. q is requantized to int8 per head each layer."""
        out = q
        for i in range(L):
            amax = jnp.max(jnp.abs(out.astype(jnp.float32)), axis=-1, keepdims=True)
            sq = jnp.maximum(amax / 127.0, 1e-10)
            q8 = jnp.clip(
                jnp.round(out.astype(jnp.float32) / sq), -127, 127
            ).astype(jnp.int8)
            s32 = jnp.einsum(
                "bqhd,bkhd->bhqk", q8, ks[i], preferred_element_type=jnp.int32
            )
            s = s32.astype(jnp.float32) * sq.transpose(0, 2, 1, 3)  # [B,H,1,1]
            out = (q + 1e-6 * jnp.max(s).astype(jnp.bfloat16)).astype(jnp.bfloat16)
        return out

    def qk_only(q, ks, vs):
        """Scores einsum alone (K read only — V untouched)."""
        out = q
        for i in range(L):
            scores = jnp.einsum(
                "bqhd,bkhd->bhqk",
                out,
                ks[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            out = (q + 1e-6 * jnp.max(scores).astype(jnp.bfloat16)).astype(
                jnp.bfloat16
            )
        return out

    def make_pallas(bt):
        from whisperx_tpu.ops.cross_attention_decode import _cross_decode_pallas

        def attn_pallas(q, ks, vs):
            out = q  # [B, 1, H, DH]
            eye = jnp.eye(H, dtype=jnp.bfloat16)
            spread = jnp.repeat(eye, DH, axis=1)  # [H, D]
            for i in range(L):
                qs = out.reshape(B, D).astype(jnp.bfloat16)[:, None, :] * spread[None]
                o = _cross_decode_pallas(qs, ks[i], vs[i], bt=bt)
                out = (q + 1e-3 * o.reshape(B, 1, H, DH)).astype(jnp.bfloat16)
            return out

        return attn_pallas

    # transposed-K layouts: [B, D, T] packed / [B, H, DH, T] per-head —
    # the QK contraction then runs over K's major dim (no MXU-feed
    # transpose of the streamed tile)
    log("transposing K...")
    tr_p = jax.jit(lambda x: jnp.transpose(x.reshape(B, T, D), (0, 2, 1)))
    tr_4 = jax.jit(lambda x: jnp.transpose(x, (0, 2, 3, 1)))  # [B,H,DH,T]
    kt_p = [jax.block_until_ready(tr_p(x)) for x in k4]
    kt_4 = [jax.block_until_ready(tr_4(x)) for x in k4]

    def attn_per_head_kt(q, ks, vs):
        """XLA einsum with transposed per-head K [B,H,DH,T]."""
        out = q
        for i in range(L):
            scores = jnp.einsum(
                "bqhd,bhdk->bhqk",
                out,
                ks[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            w = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum(
                "bhqk,bkhd->bqhd",
                w.astype(jnp.bfloat16),
                vs[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            out = (q + 1e-3 * o).astype(jnp.bfloat16)
        return out

    def make_pallas_kt(bt):
        from whisperx_tpu.ops.cross_attention_decode import _cross_decode_pallas_kt

        def attn(q, ks, vs):
            out = q
            eye = jnp.eye(H, dtype=jnp.bfloat16)
            spread = jnp.repeat(eye, DH, axis=1)  # [H, D]
            for i in range(L):
                qs = out.reshape(B, D).astype(jnp.bfloat16)[:, None, :] * spread[None]
                o = _cross_decode_pallas_kt(qs, ks[i], vs[i], bt=bt)
                out = (q + 1e-3 * o.reshape(B, 1, H, DH)).astype(jnp.bfloat16)
            return out

        return attn

    def make_pallas_i8(bt):
        from whisperx_tpu.ops.cross_attention_decode import _cross_decode_pallas_i8

        def attn(q, ks, vs):
            out = q
            eye = jnp.eye(H, dtype=jnp.float32)
            spread = jnp.repeat(eye, DH, axis=1)  # [H, D]
            for i in range(L):
                qf = out.reshape(B, D).astype(jnp.float32)
                qs = qf[:, None, :] * spread[None]  # [B, H, D]
                amax = jnp.max(jnp.abs(qs), axis=-1, keepdims=True)
                sq = jnp.maximum(amax / 127.0, 1e-10)
                qs8 = jnp.clip(jnp.round(qs / sq), -127, 127).astype(jnp.int8)
                o = _cross_decode_pallas_i8(qs8, sq, ks[i], vs[i], bt=bt)
                out = (q + 1e-3 * o.reshape(B, 1, H, DH)).astype(jnp.bfloat16)
            return out

        return attn

    results = {}
    modes = [
        ("sum_ceiling", sum_all, k4, v4, logical_gb),
        ("upcast_sum", upcast_sum, k4, v4, logical_gb),
        ("qk_int8", qk_int8, k4, v4, logical_gb / 2),
        ("per_head", attn_per_head, k4, v4, logical_gb),
    ] + [
        (f"pallas_i8_bt{bt}", make_pallas_i8(bt), kp, vp, logical_gb)
        for bt in (512, 768)
    ]
    for name, fn, ks, vs, gb in modes:
        log(f"compiling+timing {name}...")
        run = loop(fn)
        t = timed(run, q0, tuple(ks), tuple(vs)) / STEPS
        results[name] = {
            "ms": round(t * 1000, 2),
            "implied_gbps": round(gb / t, 1),
        }
        log(f"{name}: {t*1000:.2f} ms/step, {gb/t:.0f} GB/s")
    print(
        json.dumps(
            {
                "batch": B, "cross_len": T, "layers": L,
                "logical_kv_gb_per_step": round(logical_gb, 3),
                **results,
            }
        )
    )


if __name__ == "__main__":
    main()
