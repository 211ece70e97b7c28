"""ctypes bindings for the native host audio kernels (native/audio_io.c).

Compiled on first use with the system C compiler and cached next to the
source; every entry point has a numpy fallback so the package works without
a toolchain. These cover the host-side hot path around the jitted device
programs — PCM conversion, resampling, loudness normalization — the work
the reference delegates to pydub/soundfile's C internals.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["pcm16_to_f32", "f32_to_pcm16", "resample_linear",
           "downmix_to_mono", "rms_normalize", "native_available"]

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        src = os.path.join(root, "native", "audio_io.c")
        so = os.path.join(root, "native", "audio_io.so")
        try:
            if (not os.path.exists(so)
                    or os.path.getmtime(so) < os.path.getmtime(src)):
                subprocess.run(
                    ["cc", "-O3", "-shared", "-fPIC", "-o", so, src, "-lm"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(so)
            i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            lib.pcm16_to_f32.argtypes = [i16p, f32p, ctypes.c_long]
            lib.f32_to_pcm16.argtypes = [f32p, i16p, ctypes.c_long]
            lib.resample_linear_f32.argtypes = [f32p, ctypes.c_long, f32p,
                                                ctypes.c_long]
            lib.downmix_i16.argtypes = [i16p, i16p, ctypes.c_long,
                                        ctypes.c_int]
            lib.rms_normalize_f32.argtypes = [f32p, ctypes.c_long,
                                              ctypes.c_float]
            lib.rms_normalize_f32.restype = ctypes.c_float
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def pcm16_to_f32(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.int16)
    lib = _load()
    if lib is None:
        return x.astype(np.float32) / 32768.0
    out = np.empty(x.shape, np.float32)
    lib.pcm16_to_f32(x.reshape(-1), out.reshape(-1), x.size)
    return out


def f32_to_pcm16(x: np.ndarray) -> np.ndarray:
    x = np.ascontiguousarray(x, np.float32)
    lib = _load()
    if lib is None:
        return np.clip(np.round(x * 32767.0), -32768, 32767).astype(np.int16)
    out = np.empty(x.shape, np.int16)
    lib.f32_to_pcm16(x.reshape(-1), out.reshape(-1), x.size)
    return out


def resample_linear(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """float32 mono linear resample (endpoint-aligned)."""
    if src_rate == dst_rate:
        return np.asarray(x, np.float32)
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    n_out = int(round(len(x) * dst_rate / src_rate))
    lib = _load()
    if lib is None:
        xi = np.linspace(0.0, len(x) - 1, n_out)
        return np.interp(xi, np.arange(len(x)), x).astype(np.float32)
    out = np.empty(n_out, np.float32)
    lib.resample_linear_f32(x, len(x), out, n_out)
    return out


def downmix_to_mono(x: np.ndarray) -> np.ndarray:
    """(frames, channels) int16 -> (frames,) int16."""
    if x.ndim == 1:
        return np.asarray(x, np.int16)
    x = np.ascontiguousarray(x, np.int16)
    lib = _load()
    if lib is None:
        return x.mean(axis=1).astype(np.int16)
    out = np.empty(x.shape[0], np.int16)
    lib.downmix_i16(x.reshape(-1), out, x.shape[0], x.shape[1])
    return out


def rms_normalize(x: np.ndarray, target_rms: float = 0.15) -> np.ndarray:
    """In-place-style RMS normalization; returns the normalized copy."""
    x = np.ascontiguousarray(x, np.float32).copy()
    lib = _load()
    if lib is None:
        rms = float(np.sqrt(np.mean(x * x)))
        if rms > 1e-8:
            x *= target_rms / rms
        return x
    lib.rms_normalize_f32(x.reshape(-1), x.size, np.float32(target_rms))
    return x
