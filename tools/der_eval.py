#!/usr/bin/env python
"""Score a diarization hypothesis against a reference: DER one-liner.

    python tools/der_eval.py ref.rttm hyp.rttm [--collar 0.25] [--skip_overlap]

Inputs are RTTM files (the standard diarization exchange format) or JSON
files shaped like whisperx output ({"segments": [{start, end, speaker}]})
or a bare list of {start, end, speaker}. No reference-repo counterpart —
the reference ships diarization but no scorer (SURVEY §2.7); this pairs
with tools/accuracy_test.py (WER) to close the measurement loop.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_turns(path: str):
    from whisperx_tpu.utils.der import load_rttm

    if path.endswith(".rttm"):
        return load_rttm(path)
    with open(path) as f:
        data = json.load(f)
    if isinstance(data, dict):
        data = data.get("segments", [])
    turns = []
    for seg in data:
        spk = seg.get("speaker")
        if spk is None:
            continue
        turns.append((float(seg["start"]), float(seg["end"]), str(spk)))
    return turns


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("reference", help="RTTM or whisperx JSON with speakers")
    ap.add_argument("hypothesis", help="RTTM or whisperx JSON with speakers")
    ap.add_argument("--collar", type=float, default=0.25)
    ap.add_argument("--skip_overlap", action="store_true")
    args = ap.parse_args()

    from whisperx_tpu.utils.der import diarization_error_rate

    r = diarization_error_rate(
        load_turns(args.reference),
        load_turns(args.hypothesis),
        collar=args.collar,
        skip_overlap=args.skip_overlap,
    )
    print(
        json.dumps(
            {
                "der": round(r["der"], 4),
                "miss_s": round(r["miss"], 3),
                "false_alarm_s": round(r["false_alarm"], 3),
                "confusion_s": round(r["confusion"], 3),
                "scored_speech_s": round(r["total"], 3),
                "mapping": r["mapping"],
                "collar": args.collar,
                "skip_overlap": args.skip_overlap,
            }
        )
    )


if __name__ == "__main__":
    main()
