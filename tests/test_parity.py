"""Parity harness: kernel-level diffs vs torch and the mel-L1 metric."""
import numpy as np

from tts_tpu.parity import stft_diff_report, wav_mel_l1


def test_stft_kernels_match_torch():
    """The BASELINE acceptance style: mean |Δ| vs torch.stft/istft
    (reference STFT_Process.py:179-240 verification)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal(16384).astype(np.float32) * 0.1
    rep = stft_diff_report(x, n_fft=512, hop=128)
    assert rep["stft_mean_abs_err"] < 1e-5
    assert rep["istft_vs_torch_mean_abs_err"] < 1e-6
    assert rep["roundtrip_mean_abs_err"] < 1e-6


def test_wav_mel_l1_metric():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(24000).astype(np.float32) * 0.1
    assert wav_mel_l1(x, x) < 1e-6
    # scale-invariance: int16 vs float of the same signal
    xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)
    assert wav_mel_l1(x, xi) < 1e-2
    # a genuinely different signal fails the threshold
    y = rng.standard_normal(24000).astype(np.float32) * 0.1
    assert wav_mel_l1(x, y) > 1e-1
