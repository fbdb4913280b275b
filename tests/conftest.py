"""Test harness: run the whole suite on a virtual 8-device CPU mesh.

JAX runs everything on CPU here (SURVEY.md §4: the full model stack is
CI-testable with tiny random-weight configs); sharding tests see 8 virtual
devices via --xla_force_host_platform_device_count.
"""

import os

# Force CPU: the session env may pin JAX_PLATFORMS to a TPU tunnel (axon),
# whose sitecustomize re-registers itself in every process — the env var
# alone is not enough; the jax.config update below wins as long as no
# backend has initialized yet. Set WHISPERX_TPU_TEST_PLATFORM=axon to run
# the suite on the real chip instead (all tests except test_parallel pass
# there too; the mesh tests need the 8 virtual devices).
_platform = os.environ.get("WHISPERX_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Hermetic tests exercise align() with random-weight wav2vec2 models on
# purpose; the production guard (alignment/__init__.py) would skip them.
os.environ.setdefault("WHISPERX_TPU_ALLOW_RANDOM_ALIGN", "1")

import jax

jax.config.update("jax_platforms", _platform)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def nano_model():
    """Tiny random-weight Whisper (test-nano config) shared across tests."""
    from whisperx_tpu.models.whisper import load_model

    return load_model("test-nano")


def synth_speech(duration_s: float, sr: int = 16000, seed: int = 0) -> np.ndarray:
    """Synthetic speech-like audio: AM-modulated harmonics + silence gaps."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(duration_s * sr)) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t)
    sig = sum(
        (0.5 / k) * np.sin(2 * np.pi * k * np.cumsum(f0) / sr) for k in range(1, 6)
    )
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.1 * t))
    gaps = (np.sin(2 * np.pi * 0.21 * t) > -0.6).astype(np.float64)
    out = sig * env * gaps + 0.005 * rng.standard_normal(len(t))
    return (0.3 * out / np.abs(out).max()).astype(np.float32)


@pytest.fixture(scope="session")
def speech_5s():
    return synth_speech(5.0)
