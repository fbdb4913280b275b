#!/usr/bin/env python
"""Train the CI micro-Whisper and save it as a loadable checkpoint.

    python tools/train_micro_whisper.py /tmp/micro_ckpt [--steps N] [--verify]

The checkpoint drives the full product path with learned weights (natural
EOT, real no-speech head) — see whisperx_tpu/train/micro.py and
tests/test_learned_e2e.py. Useful standalone to pre-build the checkpoint
once and point the test suite at it via WHISPERX_TPU_MICRO_CKPT.
"""

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--full_steps", type=int, default=40)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--platform", default="cpu")
    ap.add_argument(
        "--verify",
        action="store_true",
        help="after training, transcribe a held-in file through the "
        "pipeline and assert exact text recovery",
    )
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from whisperx_tpu.train import save_micro_checkpoint, train_micro

    t0 = time.perf_counter()
    params, dims, report = train_micro(
        steps=args.steps,
        full_steps=args.full_steps,
        seed=args.seed,
        log_every=100,
    )
    report["train_wall_s"] = round(time.perf_counter() - t0, 1)
    save_micro_checkpoint(args.out_dir, params, dims, report)
    print(f"saved {args.out_dir}: {report}")

    if args.verify:
        from whisperx_tpu.asr import load_model
        from whisperx_tpu.train.micro import DEFAULT_CHUNK_SIZE, build_files

        pipe = load_model(
            args.out_dir,
            device=args.platform or "cpu",
            language="en",
            vad_method="energy",
            task="transcribe",
        )
        audio, events = build_files()[0]
        result = pipe.transcribe(
            audio, batch_size=8, chunk_size=DEFAULT_CHUNK_SIZE
        )
        gold = " ".join(t.strip() for _, t in events)
        hyp = " ".join(s["text"].strip() for s in result["segments"])
        assert hyp == gold, f"\ngold: {gold}\nhyp : {hyp}"
        print("verify: exact transcript recovery OK")


if __name__ == "__main__":
    main()
