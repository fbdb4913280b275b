"""ctypes bridge to the native C++ audio library (native/wav_decode.cpp).

The shared object is compiled on first use with g++ (no pybind11 needed)
and cached next to the source. Falls back cleanly — callers catch any
exception and use the pure-Python path (audio/io.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native", "wav_decode.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libwxtaudio.so") if os.path.isdir(os.path.dirname(_SRC)) else None


def _build(src: str, so_path: str) -> None:
    # compile to a temp file and atomically replace: a concurrent process
    # must never dlopen a partially written shared object
    tmp = f"{so_path}.build.{os.getpid()}"
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, src],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, so_path)


def _fresh(so_path: str) -> bool:
    return os.path.exists(so_path) and os.path.getmtime(
        so_path
    ) >= os.path.getmtime(_SRC)


def _get_lib():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SRC):
            raise RuntimeError("native source not found")
        cache_so = os.path.join(
            os.path.expanduser("~/.cache/whisperx_tpu"), "libwxtaudio.so"
        )
        so_path = _SO
        if so_path is None or not _fresh(so_path):
            if so_path is None or not os.access(os.path.dirname(so_path), os.W_OK):
                # read-only install: reuse a fresh cached build before
                # re-invoking g++ (once per process otherwise)
                so_path = cache_so
                os.makedirs(os.path.dirname(so_path), exist_ok=True)
            if not _fresh(so_path):
                _build(_SRC, so_path)
        lib = ctypes.CDLL(so_path)
        lib.wxt_decode_wav.restype = ctypes.c_long
        lib.wxt_decode_wav.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.wxt_resample.restype = ctypes.c_long
        lib.wxt_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ]
        lib.wxt_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return lib


def decode_wav_file(path: str, target_sr: int = 16000) -> np.ndarray:
    """Decode + downmix + resample a WAV file natively → float32 mono."""
    lib = _get_lib()
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.wxt_decode_wav(path.encode(), target_sr, ctypes.byref(out))
    if n < 0:
        raise RuntimeError(f"native WAV decode failed (code {n}) for {path}")
    if n == 0:  # empty result: out may be NULL
        return np.zeros(0, np.float32)
    try:
        return np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.wxt_free(out)


def resample(audio: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Native polyphase resampler."""
    lib = _get_lib()
    audio = np.ascontiguousarray(audio, np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.wxt_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(audio),
        sr_in,
        sr_out,
        ctypes.byref(out),
    )
    if n < 0:
        raise RuntimeError(f"native resample failed (code {n})")
    if n == 0:  # empty result: out may be NULL
        return np.zeros(0, np.float32)
    try:
        return np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.wxt_free(out)
