#!/usr/bin/env bash
# Clean-room install + smoke test (role of reference test_fresh_clone.sh:38-70):
# clone this repo into a temp dir, install, exercise the Python API and the
# CLI, and assert the output files exist. Hermetic: random weights, energy
# VAD, byte tokenizer; checks structure, not transcript content.
set -euo pipefail

REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
WORK="$(mktemp -d)"
trap 'rm -rf "$WORK"' EXIT

echo ">> cloning into $WORK"
git clone -q "$REPO_DIR" "$WORK/clone"
cd "$WORK/clone"

echo ">> installing (editable, no deps — uses the ambient env)"
pip install -e . --no-build-isolation --no-deps -q

echo ">> generating test audio"
python - <<'EOF'
import numpy as np
from whisperx_tpu.audio.io import save_wav
t = np.arange(16000 * 5) / 16000
sig = 0.3 * np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 3 * t) > -0.5)
save_wav("clip.wav", sig.astype(np.float32))
EOF

echo ">> python API"
python - <<'EOF'
import os

if os.environ.get("JAX_PLATFORMS"):
    # honor the caller's platform pin — the env var alone is overridden by
    # TPU-host sitecustomize (same recipe as the CLI's _pin_platform)
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import whisperx_tpu

audio = whisperx_tpu.load_audio("clip.wav")
assert audio.shape == (80000,), audio.shape
model = whisperx_tpu.load_model(
    "test-nano", vad_method="energy", language="en",
    asr_options={"temperatures": (0.0,), "sample_len": 6,
                 "log_prob_threshold": None,
                 "compression_ratio_threshold": None,
                 "no_speech_threshold": None},
    batch_size=2,
)
result = model.transcribe(audio, batch_size=2)
assert set(result) == {"segments", "language"}, result.keys()
print("API OK:", len(result["segments"]), "segments")
EOF

echo ">> CLI (txt only, no align)"
python -m whisperx_tpu clip.wav --model test-nano --vad_method energy \
    --language en --no_align --output_format txt --output_dir out \
    --batch_size 2 --verbose False
test -f out/clip.txt || { echo "FAIL: out/clip.txt missing"; exit 1; }

echo ">> CLI (all formats)"
python -m whisperx_tpu clip.wav --model test-nano --vad_method energy \
    --language en --no_align --output_format all --output_dir out_all \
    --batch_size 2 --verbose False
for ext in txt srt vtt tsv json; do
    test -f "out_all/clip.$ext" || { echo "FAIL: clip.$ext missing"; exit 1; }
done

echo ">> Degradation notices (no checkpoints -> loud fallbacks, no silent garbage)"
notice_out=$(python -m whisperx_tpu clip.wav --model test-nano --vad_method silero \
    --language en --output_format txt --output_dir out_notice \
    --batch_size 2 --verbose False 2>&1)
echo "$notice_out" | grep -q "Skipping alignment" \
    || { echo "FAIL: no alignment-skip notice"; exit 1; }
echo "$notice_out" | grep -q "energy" \
    || { echo "FAIL: no silero->energy fallback notice"; exit 1; }

echo "FRESH-INSTALL TEST PASSED"
