"""Client for the whisperx-tpu HTTP server (stdlib only).

Server:  python -m whisperx_tpu.serve --model test-nano --vad_method energy \
             --device cpu --language en --port 9090
Client:  python examples/http_client.py clip.wav [--url http://127.0.0.1:9090]
         python examples/http_client.py clip.wav --stream   # chunked PCM feed

See docs/SERVING.md for the endpoint reference.
"""

import argparse
import json
import sys
import time
import urllib.request


def post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, method="POST")
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", help="WAV file to transcribe")
    ap.add_argument("--url", default="http://127.0.0.1:9090")
    ap.add_argument("--stream", action="store_true",
                    help="feed audio as live 0.5 s PCM chunks instead")
    ap.add_argument("--format", default=None, dest="response_format",
                    help="response_format: text/srt/vtt/tsv/verbose_json "
                         "(default: native json)")
    ap.add_argument("--align", action="store_true",
                    help="server-side wav2vec2 word alignment (stage 3)")
    ap.add_argument("--diarize", action="store_true",
                    help="server-side speaker diarization (stage 4)")
    args = ap.parse_args()

    if not args.stream:
        params = []
        if args.align:
            params.append("align=true")
        if args.diarize:
            params.append("diarize=true")
        if args.response_format:
            params.append(f"response_format={args.response_format}")
        path = "/v1/audio/transcriptions" + (
            "?" + "&".join(params) if params else ""
        )
        with open(args.audio, "rb") as f:
            body = f.read()
        if args.response_format:
            # non-json formats come back as rendered text (e.g. ready-to-
            # save subtitles), exactly what the CLI writers would produce
            req = urllib.request.Request(
                args.url + path,
                data=body, method="POST",
                headers={"Content-Type": "audio/wav"},
            )
            with urllib.request.urlopen(req, timeout=600) as resp:
                sys.stdout.write(resp.read().decode())
            return
        result = post(args.url + path, body, {"Content-Type": "audio/wav"})
        for seg in result["segments"]:
            spk = f" {seg['speaker']}:" if "speaker" in seg else ""
            print(
                f"[{seg['start']:7.2f} --> {seg['end']:7.2f}]{spk} {seg['text']}"
            )
        print(f"({result['wall_s']} s wall)", file=sys.stderr)
        return

    # streaming session: decode the WAV locally, feed PCM in real time
    from whisperx_tpu.audio.io import load_audio

    audio = load_audio(args.audio)
    sid = post(args.url + "/v1/stream/start?partial_interval=0.5", b"")[
        "stream_id"
    ]
    chunk = 8000  # 0.5 s @ 16 kHz
    for i in range(0, len(audio), chunk):
        piece = audio[i:i + chunk]
        out = post(
            args.url + f"/v1/stream/{sid}/audio",
            piece.tobytes(),
            {"Content-Type": "audio/x-raw-pcm", "X-Format": "f32"},
        )
        for r in out["results"]:
            tag = "partial" if r.get("provisional") else "final  "
            print(f"  [{tag}] {r['text']}")
        time.sleep(len(piece) / 16000)  # real-time pacing
    out = post(args.url + f"/v1/stream/{sid}/end", b"")
    for r in out["results"]:
        print(f"  [final  ] {r['text']}")
    print("latency:", json.dumps(out["latency"]), file=sys.stderr)


if __name__ == "__main__":
    main()
