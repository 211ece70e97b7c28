"""Mel filterbank parity vs an independent torch implementation of the
torchaudio melscale_fbanks construction, plus log-mel pipeline shape/value
sanity (reference usage: /root/reference/F5_TTS/Export_F5.py:113,125)."""
import numpy as np
import torch

from tts_tpu.audio import MelSpectrogram, mel_filterbank


def _torch_fbanks_htk(n_freqs, f_min, f_max, n_mels, sample_rate):
    # independent reconstruction of the htk melscale_fbanks math in torch
    all_freqs = torch.linspace(0, sample_rate // 2, n_freqs, dtype=torch.float64)

    def hz2mel(f):
        return 2595.0 * torch.log10(1.0 + f / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    m_pts = torch.linspace(hz2mel(torch.tensor(float(f_min), dtype=torch.float64)),
                           hz2mel(torch.tensor(float(f_max), dtype=torch.float64)),
                           n_mels + 2, dtype=torch.float64)
    f_pts = mel2hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down, up), min=0.0)


def test_fbank_matches_torch_construction():
    fb = mel_filterbank(513, 0.0, 12000.0, 100, 24000, None, "htk")
    ref = _torch_fbanks_htk(513, 0.0, 12000.0, 100, 24000).numpy()
    assert fb.shape == (513, 100)
    assert np.abs(fb - ref).max() < 1e-5


def test_log_mel_pipeline():
    mel = MelSpectrogram(sample_rate=24000, n_fft=1024, hop=256, n_mels=100)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 24000)).astype(np.float32) * 0.1
    out = np.asarray(mel(x))
    assert out.shape == (1, 24000 // 256 + 1, 100)
    assert np.isfinite(out).all()
    # log-clamp floor
    assert out.min() >= np.log(1e-5) - 1e-4
