"""ctypes bindings for the native data-path library (native/wavenet_data.cpp).

Auto-builds ``libwavenet_data.so`` with make on first use when a toolchain
is present; everything degrades gracefully to the pure-Python/scipy path
(wavenet_tpu.audio) when it isn't. The AudioReader picks the native path
by default — wav decode, resample, and silence trim all run in C++ inside
the worker threads, so feeding the TPU costs no per-sample Python time.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwavenet_data.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None

        c = ctypes
        lib.wn_mulaw_encode.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int32, c.POINTER(c.c_int32)]
        lib.wn_mulaw_decode.argtypes = [
            c.POINTER(c.c_int32), c.c_int64, c.c_int32, c.POINTER(c.c_float)]
        lib.wn_load_wav.argtypes = [
            c.c_char_p, c.POINTER(c.POINTER(c.c_float)),
            c.POINTER(c.c_int64), c.POINTER(c.c_int32)]
        lib.wn_load_wav.restype = c.c_int
        lib.wn_resample.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_int32, c.c_int32,
            c.POINTER(c.POINTER(c.c_float)), c.POINTER(c.c_int64)]
        lib.wn_resample.restype = c.c_int
        lib.wn_trim_silence.argtypes = [
            c.POINTER(c.c_float), c.c_int64, c.c_float, c.c_int32,
            c.POINTER(c.c_int64), c.POINTER(c.c_int64)]
        lib.wn_free.argtypes = [c.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _as_float_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def mu_law_encode(audio: np.ndarray, quantization_channels: int = 256
                  ) -> np.ndarray:
    lib = _load()
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    if lib is None:
        from wavenet_tpu.audio import mu_law_encode_np
        return mu_law_encode_np(audio, quantization_channels)
    out = np.empty(audio.shape, dtype=np.int32)
    lib.wn_mulaw_encode(_as_float_ptr(audio), audio.size,
                        quantization_channels,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def mu_law_decode(codes: np.ndarray, quantization_channels: int = 256
                  ) -> np.ndarray:
    lib = _load()
    codes = np.ascontiguousarray(codes, dtype=np.int32)
    if lib is None:
        from wavenet_tpu.audio import mu_law_decode_np
        return mu_law_decode_np(codes, quantization_channels)
    out = np.empty(codes.shape, dtype=np.float32)
    lib.wn_mulaw_decode(codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        codes.size, quantization_channels, _as_float_ptr(out))
    return out


def _take_owned(lib, ptr, n) -> np.ndarray:
    """Copy a malloc'd C buffer into numpy and free it."""
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    lib.wn_free(ptr)
    return arr


def load_wav(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """(mono float32 waveform, native sample rate); None -> use fallback."""
    lib = _load()
    if lib is None:
        return None
    out = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int32()
    rc = lib.wn_load_wav(path.encode(), ctypes.byref(out), ctypes.byref(n),
                         ctypes.byref(sr))
    if rc != 0:
        return None
    return _take_owned(lib, out, n.value), int(sr.value)


def resample(audio: np.ndarray, sr_in: int, sr_out: int
             ) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    out = ctypes.POINTER(ctypes.c_float)()
    n_out = ctypes.c_int64()
    rc = lib.wn_resample(_as_float_ptr(audio), audio.size, sr_in, sr_out,
                         ctypes.byref(out), ctypes.byref(n_out))
    if rc != 0:
        return None
    return _take_owned(lib, out, n_out.value)


def trim_silence(audio: np.ndarray, threshold: float,
                 frame_length: int = 2048) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, dtype=np.float32)
    start = ctypes.c_int64()
    end = ctypes.c_int64()
    lib.wn_trim_silence(_as_float_ptr(audio), audio.size,
                        ctypes.c_float(threshold), frame_length,
                        ctypes.byref(start), ctypes.byref(end))
    return audio[start.value:end.value]


def read_wav(path: str, sample_rate: Optional[int] = None
             ) -> Optional[Tuple[np.ndarray, int]]:
    """Native load+resample; None -> caller should use the scipy path."""
    loaded = load_wav(path)
    if loaded is None:
        return None
    audio, native_sr = loaded
    if sample_rate is not None and sample_rate != native_sr:
        res = resample(audio, native_sr, sample_rate)
        if res is None:
            return None
        return res, sample_rate
    return audio, native_sr
