#!/usr/bin/env python
"""Performance acceptance gates (reference validate_performance.py:35-40 role).

Targets (TPU v5e, per chip — see BASELINE.md):
  - ASR RTF ≥ 60x  (large-v3 bf16, batch 16; reference M-series bar was 30x)
  - ASR RTF ≥ 80x  (large-v3 int8 decoder weights)
  - end-to-end (timestamps + every quality gate at product defaults) ≥ 30x
  - WER delta vs gold ≤ 0.3 (requires converted weights + gold artifacts —
    run tools/accuracy_test.py on a connected host; gated here only when
    --wer_report points at its JSON output)

Default run measures the bf16 gate only (one bench pass); --full adds the
defaults-on and int8 gates (three bench passes, ~15-30 min on a tunneled
chip). Every measurement is bench.py's adaptive best-of-N, so transient
chip contention doesn't fail a gate spuriously.
"""

import argparse
import json
import subprocess
import sys

TARGETS = {
    "asr_rtf_bf16": 60.0,
    "asr_rtf_int8": 80.0,
    "asr_rtf_int4": 80.0,
    "e2e_rtf_defaults_on": 30.0,
    "wer_delta_max": 0.3,
}


def run_bench(env=None):
    import os

    e = dict(os.environ)
    e.update(env or {})
    out = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True, env=e
    )
    if out.returncode != 0:
        tail = (out.stderr or out.stdout or "").strip().splitlines()[-5:]
        raise RuntimeError("bench.py failed:\n" + "\n".join(tail))
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="3-min audio instead of 30")
    ap.add_argument(
        "--full", action="store_true",
        help="also gate the int8 and defaults-on (e2e) targets "
             "(two extra bench passes)",
    )
    ap.add_argument(
        "--wer_report", type=str, default=None,
        help="JSON from tools/accuracy_test.py; gates wer_delta when given",
    )
    args = ap.parse_args()

    seconds = "180" if args.quick else "1800"
    measured = {}
    passed = {}

    bf16 = run_bench({"WHISPERX_TPU_BENCH_SECONDS": seconds})
    measured["asr_rtf_bf16"] = bf16["value"]
    passed["asr_rtf_bf16"] = bf16["value"] >= TARGETS["asr_rtf_bf16"]

    if args.full:
        e2e = run_bench(
            {
                "WHISPERX_TPU_BENCH_SECONDS": seconds,
                "WHISPERX_TPU_BENCH_DEFAULTS": "1",
            }
        )
        measured["e2e_rtf_defaults_on"] = e2e["value"]
        passed["e2e_rtf_defaults_on"] = (
            e2e["value"] >= TARGETS["e2e_rtf_defaults_on"]
        )

        quant = run_bench(
            {
                "WHISPERX_TPU_BENCH_SECONDS": seconds,
                "WHISPERX_TPU_BENCH_COMPUTE": "int8",
            }
        )
        measured["asr_rtf_int8"] = quant["value"]
        passed["asr_rtf_int8"] = quant["value"] >= TARGETS["asr_rtf_int8"]

        # BASELINE config 4 closes with int4 measured too. The MXU-feed
        # roofline predicted ~int8 and the 2026-08-20 same-window A/B
        # confirmed it (bf16 147x / int8 129x / int4 116x best-of-N):
        # weight-only int does NOT speed up this TPU — the decode stream
        # is feed-bound, and dequant adds work; its purpose is HBM
        # capacity. Gate int4 at the same bar as int8.
        quant4 = run_bench(
            {
                "WHISPERX_TPU_BENCH_SECONDS": seconds,
                "WHISPERX_TPU_BENCH_COMPUTE": "int4",
            }
        )
        measured["asr_rtf_int4"] = quant4["value"]
        passed["asr_rtf_int4"] = quant4["value"] >= TARGETS["asr_rtf_int4"]

    if args.wer_report:
        with open(args.wer_report) as f:
            rep = json.load(f)
        delta = rep.get("wer_delta", rep.get("wer"))
        if delta is not None:
            measured["wer_delta"] = delta
            passed["wer_delta"] = delta <= TARGETS["wer_delta_max"]

    report = {"targets": TARGETS, "measured": measured, "passed": passed}
    print(json.dumps(report, indent=2))
    sys.exit(0 if all(passed.values()) else 1)


if __name__ == "__main__":
    main()
