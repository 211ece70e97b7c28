"""Numeric parity of the framed-matmul STFT/ISTFT vs torch.stft/torch.istft.

Mirrors the reference's own validation style: mean |delta| against torch
(/root/reference/F5_TTS/STFT_Process.py:179-240) plus a round-trip
reconstruction check (Qwen variant, STFT_Process.py:311-404).
"""
import numpy as np
import pytest
import torch

from tts_tpu.audio import IstftKernel, StftKernel, make_window


CONFIGS = [
    # (n_fft, hop, win_length, window_type) — the configs the families use
    (1024, 256, 1024, "hann"),   # F5-TTS / Vocos
    (512, 160, 400, "hann"),     # reference STFT_Process defaults
    (1024, 256, 1024, "hamming"),
]


def _torch_window(window_type, win_length):
    return torch.from_numpy(make_window(window_type, win_length).copy())


@pytest.mark.parametrize("n_fft,hop,win_length,wtype", CONFIGS)
@pytest.mark.parametrize("pad_mode", ["reflect", "constant"])
def test_stft_matches_torch(n_fft, hop, win_length, wtype, pad_mode):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000).astype(np.float32)

    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft, hop_length=hop, win_length=win_length,
        window=_torch_window(wtype, win_length),
        center=True, pad_mode=pad_mode, return_complex=True,
    )
    kern = StftKernel(n_fft, hop, win_length, wtype)
    real, imag = kern(x[None, :], pad_mode=pad_mode)
    real, imag = np.asarray(real[0]), np.asarray(imag[0])

    assert real.shape == ref.shape
    assert np.abs(real - ref.real.numpy()).mean() < 1e-3
    assert np.abs(imag - ref.imag.numpy()).mean() < 1e-3


@pytest.mark.parametrize("n_fft,hop,win_length,wtype", CONFIGS)
def test_istft_matches_torch(n_fft, hop, win_length, wtype):
    rng = np.random.default_rng(1)
    t = 101
    f = n_fft // 2 + 1
    real = rng.standard_normal((f, t)).astype(np.float32)
    imag = rng.standard_normal((f, t)).astype(np.float32)
    imag[0] = 0.0
    imag[-1] = 0.0

    ref = torch.istft(
        torch.complex(torch.from_numpy(real), torch.from_numpy(imag)),
        n_fft=n_fft, hop_length=hop, win_length=win_length,
        window=_torch_window(wtype, win_length), center=True,
    ).numpy()

    kern = IstftKernel(n_fft, hop, win_length, wtype)
    out = np.asarray(kern(real[None], imag[None])[0])
    assert out.shape[-1] == ref.shape[-1]
    assert np.abs(out - ref).mean() < 2e-3


def test_roundtrip_reconstruction():
    """ISTFT(STFT(x)) ~= x in the interior (edges differ by window taper)."""
    n_fft, hop, win = 1024, 256, 1024
    rng = np.random.default_rng(2)
    x = rng.standard_normal(16384).astype(np.float32)
    s = StftKernel(n_fft, hop, win, "hann")
    i = IstftKernel(n_fft, hop, win, "hann")
    real, imag = s(x[None], pad_mode="reflect")
    y = np.asarray(i(real, imag)[0])
    m = min(len(x), len(y))
    core = slice(n_fft, m - n_fft)
    err = np.abs(y[core] - x[core]).mean()
    assert err < 1e-3, err


def test_istft_magphase_variant():
    n_fft, hop = 512, 160
    rng = np.random.default_rng(3)
    f, t = n_fft // 2 + 1, 64
    mag = np.abs(rng.standard_normal((1, f, t))).astype(np.float32)
    phase = rng.uniform(-np.pi, np.pi, (1, f, t)).astype(np.float32)
    kern = IstftKernel(n_fft, hop, 400, "hann")
    a = np.asarray(kern.from_mag_phase(mag, phase))
    b = np.asarray(kern(mag * np.cos(phase), mag * np.sin(phase)))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
