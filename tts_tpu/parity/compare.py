"""Output-fidelity comparison harness.

The acceptance criterion for this framework (BASELINE.json) is
mel-spectrogram L1 <= 1e-2 against the reference's ONNX Runtime sessions.
No checkpoints or exported graphs exist in this environment, so the harness
compares *waveforms* (ours vs a reference-generated .wav) through the same
log-mel front end, plus the reference's own kernel-level verification style:
mean |Δ| of our STFT/ISTFT against torch (STFT_Process.py:179-240).
"""
from __future__ import annotations

import numpy as np

__all__ = ["mel_l1", "wav_mel_l1", "stft_diff_report"]


def mel_l1(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """Mean |Δ| between two log-mel arrays (truncated to the common
    length)."""
    t = min(mel_a.shape[-2], mel_b.shape[-2])
    return float(np.mean(np.abs(np.asarray(mel_a)[..., :t, :]
                                - np.asarray(mel_b)[..., :t, :])))


def wav_mel_l1(wav_a: np.ndarray, wav_b: np.ndarray, sample_rate: int = 24000,
               n_fft: int = 1024, hop: int = 256, n_mels: int = 100) -> float:
    """Compare two waveforms (int16 or float) via log-mel L1 — the
    BASELINE.json fidelity metric. Waveforms are RMS-aligned first so level
    differences don't mask spectral ones."""
    import jax.numpy as jnp

    from ..audio.mel import MelSpectrogram

    def prep(w):
        w = np.asarray(w).astype(np.float32).reshape(-1)
        if np.abs(w).max() > 2.0:          # int16-scaled
            w = w / 32768.0
        rms = np.sqrt(np.mean(w * w)) + 1e-9
        return w / rms * 0.1

    n = min(len(wav_a), len(wav_b))
    ms = MelSpectrogram(sample_rate, n_fft, hop, n_fft, n_mels)
    ma = np.asarray(ms(jnp.asarray(prep(wav_a)[:n][None])))
    mb = np.asarray(ms(jnp.asarray(prep(wav_b)[:n][None])))
    return mel_l1(ma, mb)


def stft_diff_report(signal: np.ndarray, n_fft: int = 1024, hop: int = 256
                     ) -> dict:
    """Kernel-level numeric diff vs torch.stft/istft — the reference's own
    verification (STFT_Process.py main()). Returns mean |Δ| per kernel."""
    import torch

    import jax.numpy as jnp

    from ..audio.stft import IstftKernel, StftKernel

    x = np.asarray(signal, np.float32).reshape(-1)
    xt = torch.from_numpy(x)[None]
    window = torch.hann_window(n_fft)

    ref = torch.stft(xt, n_fft, hop, win_length=n_fft, window=window,
                     center=True, return_complex=True, pad_mode="reflect")
    sk = StftKernel(n_fft, hop, n_fft)
    re, im = sk(jnp.asarray(x)[None])
    t = min(ref.shape[-1], re.shape[-1])
    stft_err = float(np.mean(np.abs(
        np.asarray(re)[0, :, :t] - ref[0, :, :t].real.numpy()))
        + np.mean(np.abs(np.asarray(im)[0, :, :t] - ref[0, :, :t].imag.numpy())))

    ik = IstftKernel(n_fft, hop, n_fft)
    rec = np.asarray(ik(re, im))[0]
    ref_rec = torch.istft(ref, n_fft, hop, win_length=n_fft, window=window,
                          center=True).numpy()[0]
    n = min(len(rec), len(ref_rec))
    istft_err = float(np.mean(np.abs(rec[hop:n - hop]
                                     - ref_rec[hop:n - hop])))
    roundtrip_err = float(np.mean(np.abs(rec[hop:n - hop]
                                         - x[hop:n - hop])))
    return {"stft_mean_abs_err": stft_err,
            "istft_vs_torch_mean_abs_err": istft_err,
            "roundtrip_mean_abs_err": roundtrip_err}
