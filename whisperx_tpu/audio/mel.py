"""Log-mel spectrogram front end, TPU-native.

Numerical contract (reference whisperx/audio.py:94-159):
  hann(400, periodic) STFT with hop 160, center=True reflect padding,
  drop the final frame, |.|^2, slaney mel filterbank (librosa-compatible,
  computed here from the closed form instead of shipping an .npz),
  log10 clamped at 1e-10, dynamic-range floor at (max - 8), then (x+4)/4.

TPU-native design: rather than an FFT op, the windowed DFT is expressed as a
single strided 1-D convolution with 2*(n_fft//2+1) output channels (cos and
sin banks). XLA lowers this onto the MXU and fuses the squared-magnitude,
mel projection, and log/normalize epilogue — one pass over HBM, no
host-side torch.stft (reference audio.py:149-158).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from whisperx_tpu.audio.constants import HOP_LENGTH, N_FFT, SAMPLE_RATE


def _hz_to_mel(freq: np.ndarray | float) -> np.ndarray:
    """Slaney-scale hz→mel (librosa default, htk=False)."""
    freq = np.asarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = freq >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = mels * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs
    )
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filters(n_mels: int, sr: int = SAMPLE_RATE, n_fft: int = N_FFT) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2 + 1).

    Equivalent to ``librosa.filters.mel(sr=16000, n_fft=400, n_mels=n_mels)``
    — the matrix the reference ships as ``assets/mel_filters.npz``
    (whisperx/audio.py:96-113); here it is computed from the closed form.
    """
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: each filter integrates to ~equal area.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_conv_kernel(n_fft: int = N_FFT) -> np.ndarray:
    """Windowed DFT as a conv kernel, shape (2*(n_fft//2+1), 1, n_fft).

    Channels [0, F) are the hann-windowed cosine bank, [F, 2F) the sine bank,
    so one strided conv yields both real and imaginary STFT parts.
    """
    n_freqs = 1 + n_fft // 2
    n = np.arange(n_fft)
    # periodic hann window (torch.hann_window default)
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / n_fft))
    k = np.arange(n_freqs)[:, None]
    angles = 2.0 * np.pi * k * n[None, :] / n_fft
    cos_bank = (np.cos(angles) * window[None, :]).astype(np.float32)
    sin_bank = (-np.sin(angles) * window[None, :]).astype(np.float32)
    return np.concatenate([cos_bank, sin_bank], axis=0)[:, None, :]


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int = N_FFT) -> np.ndarray:
    """Windowed DFT as a [n_fft, 2*(n_fft//2+1)] matmul matrix
    (cos bank ‖ sin bank), for the reshape-framing STFT path."""
    banks = _dft_conv_kernel(n_fft)[:, 0, :]  # (2F, n_fft)
    return np.ascontiguousarray(banks.T)  # (n_fft, 2F)


def _frame_signal(padded: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """[..., L] reflect-padded signal → [..., n_frames, N_FFT] frames at
    HOP_LENGTH stride — pure reshapes/slices (no gather, no conv):
    N_FFT = 2.5 hops, so frame k = rows k, k+1 and half of row k+2 of the
    hop-strided reshape."""
    lead = padded.shape[:-1]
    length = padded.shape[-1]
    rows_needed = n_frames + 2
    target = rows_needed * HOP_LENGTH
    if length < target:
        padded = jnp.pad(
            padded, [(0, 0)] * len(lead) + [(0, target - length)]
        )
    else:
        padded = padded[..., :target]
    x2 = padded.reshape(*lead, rows_needed, HOP_LENGTH)
    a = x2[..., 0:n_frames, :]
    b = x2[..., 1 : n_frames + 1, :]
    c = x2[..., 2 : n_frames + 2, : N_FFT - 2 * HOP_LENGTH]
    return jnp.concatenate([a, b, c], axis=-1)  # [..., n_frames, N_FFT]


def _stft_power(padded: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """[..., L] → power spectrum [..., n_frames, n_freqs] via framed matmul
    on the MXU (the strided-conv formulation compiles and runs poorly on
    TPU; two dense matmuls are ~100× faster)."""
    frames = _frame_signal(padded, n_frames)
    dft = jnp.asarray(_dft_matrices())
    spec = jnp.einsum(
        "...tw,wf->...tf", frames, dft, precision=jax.lax.Precision.HIGHEST
    )
    n_freqs = 1 + N_FFT // 2
    return spec[..., :n_freqs] ** 2 + spec[..., n_freqs:] ** 2


@functools.partial(jax.jit, static_argnames=("n_mels", "padding"))
def _log_mel_jit(audio: jnp.ndarray, n_mels: int, padding: int) -> jnp.ndarray:
    if padding > 0:
        audio = jnp.pad(audio, (0, padding))
    half = N_FFT // 2
    # center=True reflect padding, matching torch.stft; torch yields
    # 1 + L//hop frames and the reference drops the last (audio.py:150),
    # leaving exactly L // hop frames.
    n_frames = audio.shape[-1] // HOP_LENGTH
    padded = jnp.pad(audio, (half, half), mode="reflect")
    magnitudes = _stft_power(padded, n_frames)  # [T, F]

    filters = jnp.asarray(mel_filters(n_mels))
    mel_spec = jnp.einsum(
        "tf,mf->mt", magnitudes, filters, precision=jax.lax.Precision.HIGHEST
    )  # (n_mels, T)

    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max() - 8.0)
    return (log_spec + 4.0) / 4.0


def _log_mel_batch_body(audio: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    """Traced body: [N, L] → [N, frames, n_mels] (per-item dynamic-range
    floor). Shared by the host-sliced batch path and the device-side chunk
    gather (audio/device_chunk.py) so both are the identical XLA program
    after the rows materialize."""
    half = N_FFT // 2
    n_frames = audio.shape[-1] // HOP_LENGTH
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")
    magnitudes = _stft_power(padded, n_frames)  # [N, T, F]

    filters = jnp.asarray(mel_filters(n_mels))
    mel_spec = jnp.einsum(
        "ntf,mf->ntm", magnitudes, filters, precision=jax.lax.Precision.HIGHEST
    )  # [N, T, n_mels]
    log_spec = jnp.log10(jnp.maximum(mel_spec, 1e-10))
    log_spec = jnp.maximum(
        log_spec, log_spec.max(axis=(1, 2), keepdims=True) - 8.0
    )
    return (log_spec + 4.0) / 4.0


@functools.partial(jax.jit, static_argnames=("n_mels",))
def _log_mel_batch_jit(audio: jnp.ndarray, n_mels: int) -> jnp.ndarray:
    return _log_mel_batch_body(audio, n_mels)


def log_mel_batch(
    audio: "np.ndarray", n_mels: int = 80, max_batch: int = 64
) -> jnp.ndarray:
    """Batched log-mel for equal-length chunks: ONE device program per
    power-of-two batch bucket (the per-chunk host loop was the pipeline's
    dominant non-decode cost). Zero-padded rows are computed and discarded —
    cheaper than a recompile per distinct chunk count."""
    import numpy as np

    # device arrays stay on device (callers pre-upload to skip the slow
    # host tunnel); numpy input pads on host as before
    xp = jnp if isinstance(audio, jnp.ndarray) else np
    n = audio.shape[0]
    bucket = 1
    while bucket < min(n, max_batch):
        bucket *= 2
    parts = []
    for i in range(0, n, bucket):
        part = audio[i : i + bucket]
        if part.shape[0] < bucket:
            part = xp.concatenate(
                [
                    part,
                    xp.zeros(
                        (bucket - part.shape[0], audio.shape[1]), xp.float32
                    ),
                ]
            )
        parts.append(_log_mel_batch_jit(jnp.asarray(part, jnp.float32), n_mels))
    if not parts:  # empty batch: [0, T, n_mels], not an IndexError
        frames = audio.shape[1] // HOP_LENGTH if audio.ndim > 1 else 0
        return jnp.zeros((0, frames, n_mels), jnp.float32)
    out = jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]
    return out[:n]


def log_mel_spectrogram(
    audio, n_mels: int = 80, padding: int = 0
) -> jnp.ndarray:
    """Compute the log-mel spectrogram, shape (n_mels, n_frames).

    ``audio`` may be a file path, numpy array, or JAX array of 16 kHz mono
    samples. One jitted program handles any length (recompiled per distinct
    length; callers should pad to standard chunk sizes for cache hits).
    """
    if isinstance(audio, str):
        from whisperx_tpu.audio.io import load_audio

        audio = load_audio(audio)
    audio = jnp.asarray(audio, dtype=jnp.float32)
    return _log_mel_jit(audio, n_mels, padding)
