"""Data-parallel transcription over a device mesh.

``data_parallel_transcribe`` runs the ORDINARY pipeline — VAD,
device-side chunk mels, the batched `_decode_jit` while_loop — with every
decode batch sharded over the mesh 'data' axis (and optionally the model
tensor-parallel over 'model'). Same program, same tokens; XLA inserts the
collectives.

On a multi-chip host this uses the real devices; hermetically, force an
8-device virtual CPU mesh:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/data_parallel.py
"""

import jax
import numpy as np

import whisperx_tpu
from whisperx_tpu.parallel import data_parallel_transcribe, make_mesh


def synth(duration_s: float, sr: int = 16000) -> np.ndarray:
    t = np.arange(int(duration_s * sr)) / sr
    gate = (np.sin(2 * np.pi * 0.4 * t) > -0.5).astype(np.float32)
    return (0.2 * np.sin(2 * np.pi * 220 * t) * gate).astype(np.float32)


def main():
    devices = jax.devices()
    print(f"{len(devices)} device(s): {[d.platform for d in devices[:3]]}...")

    pipeline = whisperx_tpu.load_model(
        "test-nano",  # swap for "large-v3" / a converted checkpoint dir
        vad_method="energy",
        language="en",
        asr_options={"temperatures": (0.0,), "sample_len": 16},
    )
    audio = synth(90.0)

    if len(devices) > 1:
        # TP over pairs when the device count is even, else pure DP
        n_model = 2 if len(devices) % 2 == 0 else 1
        mesh = make_mesh(n_model=n_model)
        result = data_parallel_transcribe(pipeline, audio, mesh=mesh)
        print(f"mesh {dict(mesh.shape)} → {len(result['segments'])} segments")
    else:
        result = pipeline.transcribe(audio)
        print(f"single device → {len(result['segments'])} segments")

    for seg in result["segments"][:5]:
        print(f"[{seg['start']:7.2f} → {seg['end']:7.2f}] {seg['text'][:60]}")


if __name__ == "__main__":
    main()
