"""Worker process for tests/test_multihost_exec.py.

Joins the multi-process JAX runtime over a localhost coordinator (the
CPU stand-in for a TPU pod slice's DCN), takes its strided slice of the
file list, transcribes it with the hermetic test-nano pipeline, and writes
one transcript + a manifest per process.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("wavs", nargs="+")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from whisperx_tpu.parallel import initialize_multihost, shard_files

    pid, n = initialize_multihost(args.coordinator, args.n, args.pid)
    assert (pid, n) == (args.pid, args.n), (pid, n)

    # a REAL cross-process collective over the coordinator transport: every
    # process must see every other's id
    from jax.experimental import multihost_utils

    seen = multihost_utils.process_allgather(jax.numpy.asarray([pid]))
    assert sorted(int(x) for x in seen.ravel()) == list(range(n)), seen

    mine = shard_files(args.wavs)

    from whisperx_tpu.asr import load_model

    pipe = load_model(
        "test-nano",
        device="cpu",
        compute_type="float32",
        language="en",
        vad_method="energy",
        task="transcribe",
        asr_options={"sample_len": 4},
    )
    from whisperx_tpu.audio import load_audio

    done = []
    for wav in mine:
        result = pipe.transcribe(load_audio(wav), batch_size=1)
        base = os.path.splitext(os.path.basename(wav))[0]
        with open(
            os.path.join(args.out, base + ".json"), "w", encoding="utf-8"
        ) as f:
            json.dump({"segments": result["segments"], "host": pid}, f)
        done.append(wav)

    with open(
        os.path.join(args.out, f"manifest_{pid}.json"), "w", encoding="utf-8"
    ) as f:
        json.dump({"pid": pid, "n": n, "files": done}, f)
    print(f"worker {pid}/{n} done: {len(done)} files")


if __name__ == "__main__":
    main()
