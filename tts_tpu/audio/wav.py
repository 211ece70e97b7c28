"""Minimal WAV I/O on the stdlib `wave` module (int16 PCM in/out).

Replaces the reference's pydub/soundfile dependency (neither is available in
this environment); the framework's graph contract matches the reference's:
all pipelines take/emit int16 PCM (SURVEY.md §1 L4).
"""
from __future__ import annotations

import wave

import numpy as np

__all__ = ["read_wav", "write_wav", "resample_linear"]


def read_wav(path: str, target_rate: int | None = None) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (int16 mono samples, sample_rate).

    Multi-channel audio is averaged to mono. If `target_rate` is given and
    differs, linear resampling is applied (matching pydub's simple behaviour
    closely enough for reference-audio conditioning).
    """
    with wave.open(path, "rb") as f:
        n_channels = f.getnchannels()
        sampwidth = f.getsampwidth()
        rate = f.getframerate()
        raw = f.readframes(f.getnframes())
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype=np.int16)
    elif sampwidth == 4:
        data = (np.frombuffer(raw, dtype=np.int32) >> 16).astype(np.int16)
    elif sampwidth == 1:
        data = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"unsupported sample width {sampwidth}")
    if n_channels > 1:
        from ..native import downmix_to_mono

        data = downmix_to_mono(data.reshape(-1, n_channels))
    if target_rate is not None and target_rate != rate:
        data = resample_linear(data, rate, target_rate)
        rate = target_rate
    return data, rate


def resample_linear(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """int16 linear resample through the native kernel (numpy fallback)."""
    from ..native import f32_to_pcm16, pcm16_to_f32
    from ..native import resample_linear as native_resample

    return f32_to_pcm16(native_resample(pcm16_to_f32(x), src_rate, dst_rate))


def write_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Write int16 mono PCM."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        samples = np.clip(samples, -1.0, 1.0)
        samples = (samples * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.reshape(-1).tobytes())
