"""Device-side chunking: upload raw audio ONCE, slice + mel on device.

Round-2 profile truth (docs/PERFORMANCE.md): the device tunnel moves
~40 MB/s, so every extra pass of the raw waveform over it costs seconds on
long audio. The reference's lightning backend computes the mel once and
slices features on the host (reference whisperx/backends/mlx_lightning.py:162-217);
the TPU-native conclusion of that trick is to keep the *waveform* resident:

  1. one upload of the raw samples (int16 when PCM-exact — lossless);
  2. VAD probabilities computed from the resident array (vad/energy.py,
     vad/silero.py accept device audio) — the host downloads only the
     per-window probs (~KB);
  3. per-chunk windows gathered on device (`starts[:,None] + arange`) and
     fed straight into the shared log-mel body — the host never touches
     chunk samples at all.

The gathered rows reproduce the host path bit-for-bit: `chunk_mels` masks
beyond each chunk's length (zero padding to 30 s BEFORE the mel, whisper
training-time semantics) and then runs the same `_log_mel_batch_body`
program as `log_mel_batch`.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.audio.constants import HOP_LENGTH, N_SAMPLES, SAMPLE_RATE
from whisperx_tpu.audio.mel import _log_mel_batch_body

# Uploads are padded to whole minutes so XLA sees few distinct lengths
# (one compile per minute-bucket instead of one per file). 960000 samples
# is divisible by the 512-sample VAD window, so VAD framing needs no
# re-padding on device.
AUDIO_BUCKET = 60 * SAMPLE_RATE


class DeviceAudio(NamedTuple):
    """A device-resident waveform plus its un-padded sample count."""

    data: jnp.ndarray  # [padded_len] float32, zero beyond `length`
    length: int


def _pcm16_exact(padded: np.ndarray) -> Optional[np.ndarray]:
    """The waveform as int16 when that is LOSSLESS, else None: values of
    the form k/32768 scale to exact integers in f32, so the check is a
    bitwise guarantee, not a tolerance. int16's range is asymmetric —
    -32768 is representable (a full-scale negative sample from clipped
    PCM must not force an f32 upload)."""
    scaled = padded * 32768.0
    a16 = np.round(scaled)
    if (
        np.abs(scaled - a16).max() == 0.0
        and a16.min() >= -32768
        and a16.max() <= 32767
    ):
        return a16.astype(np.int16)
    return None


_MU = 255.0


def mulaw_encode(padded: np.ndarray) -> np.ndarray:
    """8-bit μ-law companding (G.711-style, vectorized): [L] f32 in [-1,1]
    → [L] uint8. Quantization SNR for speech-level signals is ~38 dB —
    far above the log-mel floor, but lossy: upload companding is OPT-IN
    (WHISPERX_TPU_UPLOAD_COMPAND=mulaw) and every use must be validated
    against the transcript (tests/test_audio.py, tools chip A/B)."""
    x = np.clip(padded, -1.0, 1.0)
    y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
    return np.round((y + 1.0) * 127.5).astype(np.uint8)


@jax.jit
def mulaw_expand(u8: jnp.ndarray) -> jnp.ndarray:
    """Device-side inverse companding: one fused elementwise pass, so the
    tunnel moves 1 byte/sample and the chip pays ~nothing to expand."""
    y = u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0
    return jnp.sign(y) * (jnp.exp(jnp.abs(y) * np.log1p(_MU)) - 1.0) / _MU


def pack12_encode(padded: np.ndarray) -> np.ndarray:
    """12-bit linear packing: [L] f32 (L even) → [L*3/2] uint8. Linear
    quantization at 2^-11 amplitude steps — the noise floor stays ~66 dB
    below full scale, so unlike μ-law the log-mel's quiet bins are
    essentially untouched; 1.33× fewer bytes than int16."""
    a = np.clip(np.round(padded * 2048.0), -2048, 2047).astype(np.int32)
    u = (a & 0xFFF).astype(np.uint16)  # two's complement, 12 bits
    lo, hi = u[0::2], u[1::2]
    b0 = lo & 0xFF
    b1 = (lo >> 8) | ((hi & 0xF) << 4)
    b2 = hi >> 4
    return np.stack([b0, b1, b2], axis=1).astype(np.uint8).reshape(-1)


@jax.jit
def pack12_expand(u8: jnp.ndarray) -> jnp.ndarray:
    """Device-side unpack: integer shifts + a sign fold, fully fused.

    Everything stays 1-D: a [N,3] reshape looks harmless but TPU tiling
    pads the size-3 minor dimension to (8,128) lanes — a measured 42×
    HBM expansion that OOM'd a 30-minute waveform (6.9 GB temp for a
    165 MB array). Strided 1-D slices and scatters tile cleanly."""
    b = u8.astype(jnp.int32)
    b0, b1, b2 = b[0::3], b[1::3], b[2::3]
    lo = b0 | ((b1 & 0xF) << 8)
    hi = (b1 >> 4) | (b2 << 4)
    lo = jnp.where(lo >= 2048, lo - 4096, lo)
    hi = jnp.where(hi >= 2048, hi - 4096, hi)
    out = jnp.zeros(lo.shape[0] * 2, jnp.float32)
    out = out.at[0::2].set(lo.astype(jnp.float32) / 2048.0)
    out = out.at[1::2].set(hi.astype(jnp.float32) / 2048.0)
    return out


def _compand_mode() -> str:
    import os

    return os.environ.get("WHISPERX_TPU_UPLOAD_COMPAND", "").lower()


def to_device(padded: np.ndarray) -> jnp.ndarray:
    """Upload audio, as int16 when it is PCM-exact (the int16 payload
    halves the ~40 MB/s tunnel cost), or — opt-in via
    WHISPERX_TPU_UPLOAD_COMPAND — as 8-bit μ-law (2× fewer bytes than
    int16, lossy: ~38 dB SNR with a raised noise floor in quiet mel bins)
    or 12-bit packed linear (1.33× fewer, near-lossless). The upload wall
    was 32-45% of a best bench pass in round 4 (BENCH_r04.json stages) and
    transfer pipelining is a measured dead end on this tunnel
    (docs/ROADMAP.md session 3), so fewer bytes is the remaining lever."""
    mode = _compand_mode()
    if mode == "mulaw":
        return mulaw_expand(jnp.asarray(mulaw_encode(padded)))
    if mode == "pack12":
        return pack12_expand(jnp.asarray(pack12_encode(padded)))
    a16 = _pcm16_exact(padded)
    if a16 is not None:
        return jnp.asarray(a16).astype(jnp.float32) / 32768.0
    return jnp.asarray(padded)


def upload_audio(audio: Union[np.ndarray, DeviceAudio]) -> DeviceAudio:
    """Pad to a minute bucket and upload once. Idempotent on DeviceAudio."""
    if isinstance(audio, DeviceAudio):
        return audio
    audio = np.asarray(audio, np.float32).reshape(-1)
    n = len(audio)
    target = max(AUDIO_BUCKET, -(-n // AUDIO_BUCKET) * AUDIO_BUCKET)
    if target != n:
        padded = np.zeros(target, np.float32)
        padded[:n] = audio
    else:
        padded = audio
    return DeviceAudio(to_device(padded), n)


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _gather_chunk_mels_jit(
    audio: jnp.ndarray, starts: jnp.ndarray, lengths: jnp.ndarray, n_mels: int
) -> jnp.ndarray:
    """audio [L], starts/lengths [N] → [N, 3000, n_mels] log-mels.

    Each row is audio[start : start+length] zero-padded to 30 s — the
    gather+mask formulation of asr.py's former host slice loop, fused by
    XLA into the mel's framing matmul so the [N, 480000] intermediate
    never round-trips HBM unfused.
    """
    offs = jnp.arange(N_SAMPLES, dtype=jnp.int32)
    idx = jnp.clip(starts[:, None] + offs[None, :], 0, audio.shape[0] - 1)
    rows = jnp.where(
        offs[None, :] < lengths[:, None], jnp.take(audio, idx), 0.0
    )
    return _log_mel_batch_body(rows, n_mels)


def chunk_mels(
    dev: DeviceAudio, chunks: List[dict], n_mels: int, max_batch: int = 64
) -> jnp.ndarray:
    """Per-chunk log-mels gathered from the resident waveform.

    Chunk counts are bucketed to powers of two (≤ max_batch) so XLA
    compiles one program per bucket; zero-length padded rows compute a
    silence mel that is sliced off.
    """
    n = len(chunks)
    starts = np.zeros(n, np.int32)
    lengths = np.zeros(n, np.int32)
    for i, ch in enumerate(chunks):
        s = int(ch["start"] * SAMPLE_RATE)
        e = min(int(ch["end"] * SAMPLE_RATE), dev.length)
        starts[i] = s
        lengths[i] = min(max(e - s, 0), N_SAMPLES)

    bucket = 1
    while bucket < min(n, max_batch):
        bucket *= 2
    parts = []
    for i in range(0, n, bucket):
        s_part = starts[i : i + bucket]
        l_part = lengths[i : i + bucket]
        if len(s_part) < bucket:
            pad = bucket - len(s_part)
            s_part = np.concatenate([s_part, np.zeros(pad, np.int32)])
            l_part = np.concatenate([l_part, np.zeros(pad, np.int32)])
        parts.append(
            _gather_chunk_mels_jit(
                dev.data, jnp.asarray(s_part), jnp.asarray(l_part), n_mels
            )
        )
    if not parts:  # no chunks: empty [0, 3000, n_mels], not an IndexError
        return jnp.zeros((0, N_SAMPLES // HOP_LENGTH, n_mels), jnp.float32)
    out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return out[:n]
