"""Speculative decoding example: small draft proposes, target verifies.

The whole draft→verify→accept loop runs as ONE jitted device program
(whisperx_tpu/decoding/speculative.py::_spec_loop_jit); with greedy
verification the output matches plain greedy decoding of the target,
at up to γ+1 tokens per target pass. With converted checkpoints, pair
large-v3 with distil-large-v3; hermetically, this demo uses a self-draft
(the target's own first k decoder layers).

Run: python examples/speculative_decode.py
"""

import numpy as np

from whisperx_tpu.audio import log_mel_spectrogram, pad_or_trim
from whisperx_tpu.decoding import DecodingOptions
from whisperx_tpu.decoding.speculative import (
    SpeculativeDecoder,
    truncated_self_draft,
)
from whisperx_tpu.models.whisper import load_model

# real use: target = load_model("large-v3"); draft = load_model("distil-large-v3")
target = load_model("test-nano")
draft = truncated_self_draft(target, n_layers=1)

audio = np.random.default_rng(0).standard_normal(16000 * 5).astype(np.float32) * 0.1
mel = log_mel_spectrogram(
    np.asarray(pad_or_trim(audio), np.float32), target.dims.n_mels
).T

spec = SpeculativeDecoder(target, draft, gamma=4)
result = spec.decode_jit(mel, DecodingOptions(language="en", sample_len=32))

print("tokens:", result.tokens)
print("text:", result.text or "(random weights: byte soup expected)")
print(
    f"acceptance={spec.stats.acceptance_rate:.2f} "
    f"target_passes={spec.stats.target_steps} "
    f"tokens/pass={len(result.tokens) / max(1, spec.stats.target_steps):.1f}"
)

# ---------------------------------------------------------------------------
# Pipeline-level speculative decoding (round 3): pass the draft straight to
# the pipeline — the batched temperature-0 path runs the speculative loop
# (B>1 via the vmapped batch program), token-identical to the plain
# pipeline. On the CLI: --draft_model distil-large-v3 --spec_gamma 4
# ---------------------------------------------------------------------------
import whisperx_tpu

pipeline = whisperx_tpu.load_model(
    "test-nano",  # real use: "large-v3"
    vad_method="energy",
    language="en",
    asr_options={
        "draft_model": draft,  # or a model name / checkpoint path, or
        # "self:8" to draft from the target's own first 8 decoder layers
        # (no second checkpoint; speedup depends on early-exit agreement)
        "spec_gamma": 4,
        "temperatures": (0.0,),
        "sample_len": 16,
    },
)
speech = np.sin(
    2 * np.pi * 220 * np.arange(16000 * 8) / 16000
).astype(np.float32) * 0.2
result = pipeline.transcribe(speech, batch_size=2)
print(f"pipeline segments: {len(result['segments'])}")
print("acceptance stats:", pipeline._spec_decoder.stats if pipeline._spec_decoder else None)
