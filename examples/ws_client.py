"""WebSocket streaming client for the whisperx-tpu server (stdlib only).

Feeds a WAV file as live PCM chunks over the RFC 6455 push transport
(`GET /v1/ws`, see docs/SERVING.md) and prints results the moment the
server pushes them — no polling. Pacing simulates a real-time source.

Server:  python -m whisperx_tpu.serve --model test-nano --vad_method energy \
             --device cpu --language en --port 9090
Client:  python examples/ws_client.py clip.wav [--host 127.0.0.1 --port 9090]
         python examples/ws_client.py clip.wav --partial_interval 0.5
"""

import argparse
import base64
import json
import os
import socket
import struct
import threading
import time
import wave

import numpy as np


class WSClient:
    """Minimal RFC 6455 client: handshake + masked frames."""

    def __init__(self, host, port, path):
        self.sock = socket.create_connection((host, port), timeout=600)
        key = base64.b64encode(os.urandom(16)).decode()
        self.sock.sendall(
            (
                f"GET {path} HTTP/1.1\r\nHost: {host}:{port}\r\n"
                "Upgrade: websocket\r\nConnection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        self.buf = b""
        while b"\r\n\r\n" not in self.buf:
            self.buf += self.sock.recv(4096)
        head, _, self.buf = self.buf.partition(b"\r\n\r\n")
        status = int(head.split(b" ", 2)[1])
        if status != 101:
            raise RuntimeError(f"upgrade refused: HTTP {status}\n{head.decode()}")

    def _recv_exact(self, n):
        while len(self.buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("server closed")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def send_frame(self, opcode, payload):
        header = bytearray([0x80 | opcode])
        ln = len(payload)
        if ln < 126:
            header.append(0x80 | ln)
        elif ln < 1 << 16:
            header.append(0x80 | 126)
            header += struct.pack(">H", ln)
        else:
            header.append(0x80 | 127)
            header += struct.pack(">Q", ln)
        mask = os.urandom(4)
        header += mask
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self.sock.sendall(bytes(header) + masked)

    def recv_frame(self):
        b1, b2 = self._recv_exact(2)
        opcode, ln = b1 & 0x0F, b2 & 0x7F
        if ln == 126:
            (ln,) = struct.unpack(">H", self._recv_exact(2))
        elif ln == 127:
            (ln,) = struct.unpack(">Q", self._recv_exact(8))
        return opcode, self._recv_exact(ln)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("audio", help="16 kHz mono WAV file")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=9090)
    ap.add_argument("--chunk_s", type=float, default=0.5)
    ap.add_argument("--partial_interval", type=float, default=None,
                    help="ask for provisional partials this often (s)")
    ap.add_argument("--language", default=None)
    ap.add_argument("--realtime", action="store_true",
                    help="pace chunks at 1x (sleep chunk_s between sends)")
    args = ap.parse_args()

    with wave.open(args.audio, "rb") as w:
        assert w.getsampwidth() == 2, "expected 16-bit WAV"
        sr = w.getframerate()
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        if w.getnchannels() > 1:
            pcm = pcm.reshape(-1, w.getnchannels()).mean(1).astype(np.int16)

    params = [f"format=i16", f"sample_rate={sr}"]
    if args.partial_interval:
        params.append(f"partial_interval={args.partial_interval}")
    if args.language:
        params.append(f"language={args.language}")
    ws = WSClient(args.host, args.port, "/v1/ws?" + "&".join(params))

    done = threading.Event()

    def reader():
        # results arrive PUSHED, interleaved with our sends; ANY exit
        # (close frame, socket death) must release the main thread
        try:
            while not done.is_set():
                try:
                    op, payload = ws.recv_frame()
                except (ConnectionError, OSError):
                    print("-- connection closed by server")
                    break
                if op == 0x8:  # close
                    break
                if op != 0x1:
                    continue
                msg = json.loads(payload)
                if msg["op"] == "result":
                    tag = "partial" if msg.get("provisional") else "final  "
                    lat = msg.get("latency_s")
                    lat_s = (
                        f"  ({lat:.2f}s behind live)" if lat is not None else ""
                    )
                    print(f"[{tag}] {msg['start']:7.2f}-{msg['end']:7.2f}  "
                          f"{msg['text']}{lat_s}")
                elif msg["op"] == "end":
                    print(f"-- stream closed: {msg['result_count']} results, "
                          f"latency {json.dumps(msg['latency'])}")
                    done.set()
                elif msg["op"] == "error":
                    print(f"!! {msg['error']}")
        finally:
            done.set()

    t = threading.Thread(target=reader, daemon=True)
    t.start()

    step = int(args.chunk_s * sr)
    for i in range(0, len(pcm), step):
        ws.send_frame(0x2, pcm[i:i + step].tobytes())
        if args.realtime:
            time.sleep(args.chunk_s)
    ws.send_frame(0x1, json.dumps({"op": "end"}).encode())
    done.wait(timeout=600)


if __name__ == "__main__":
    main()
