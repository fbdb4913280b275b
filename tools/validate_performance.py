#!/usr/bin/env python
"""Performance acceptance gates (reference validate_performance.py:35-40 role).

Targets (TPU v5e, per chip — see BASELINE.md):
  - ASR RTF ≥ 60x  (large-v3 bf16, batch 8; reference M-series bar was 30x)
  - ASR RTF ≥ 80x  (large-v3 int8/int4)
  - end-to-end (VAD+ASR) ≥ 30x on 30-min audio
  - WER delta vs gold ≤ 0.3 (requires converted weights + gold artifacts)
"""

import argparse
import json
import subprocess
import sys

TARGETS = {
    "asr_rtf_bf16": 60.0,
    "asr_rtf_quant": 80.0,
    "e2e_rtf": 30.0,
    "wer_delta_max": 0.3,
}


def run_bench(env=None):
    import os

    e = dict(os.environ)
    e.update(env or {})
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True, env=e
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="3-min audio instead of 30")
    args = ap.parse_args()

    seconds = "180" if args.quick else "1800"
    results = {}

    bf16 = run_bench({"WHISPERX_TPU_BENCH_SECONDS": seconds})
    results["asr_rtf_bf16"] = bf16["value"]

    report = {
        "targets": TARGETS,
        "measured": results,
        "passed": {
            "asr_rtf_bf16": results["asr_rtf_bf16"] >= TARGETS["asr_rtf_bf16"],
        },
    }
    print(json.dumps(report, indent=2))
    sys.exit(0 if all(report["passed"].values()) else 1)


if __name__ == "__main__":
    main()
