"""STFT / ISTFT as framed matmuls — TPU-native re-design of the reference's
conv-based DSP kernels (/root/reference/F5_TTS/STFT_Process.py:67-173).

The reference expresses STFT as conv1d against windowed cos/sin DFT kernels and
ISTFT as conv_transpose1d against a pseudo-inverse Fourier basis followed by a
precomputed overlap-add window-sum normalization. Here both are re-designed for
the MXU instead of translated:

* Framing: with K = ceil(n_fft / hop), a hop-aligned signal reshaped to
  (M, hop) rows gives frame t as rows[t : t+K] — so frames are K *static
  slices* concatenated, not a gather and not a strided conv. One (T, K*hop) @
  (K*hop, 2F) matmul then computes all DFT bins on the MXU.
* Overlap-add: the inverse is the mirror image — (T, 2F) @ (2F, K*hop), then
  the K hop-sized chunks of each frame are added at K static offsets. No
  scatter, no conv_transpose; every op is a reshape, pad, add, or matmul.

Variants match the reference contract:
  stft_a  -> real part only
  stft_b  -> (real, imag)
  istft_a -> input (magnitude, phase)
  istft_b -> input (real, imag)
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from .windows import make_window, padded_window

__all__ = ["StftKernel", "IstftKernel", "stft", "istft"]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _dft_basis(n_fft: int) -> np.ndarray:
    """Real-stacked one-sided DFT basis, shape (2F, n_fft), F = n_fft//2 + 1."""
    eye = np.fft.fft(np.eye(n_fft, dtype=np.float64))
    half = n_fft // 2 + 1
    return np.vstack([eye[:half].real, eye[:half].imag])


@dataclass(frozen=True)
class StftKernel:
    """Precomputed forward STFT constants (host numpy, converted at trace)."""

    n_fft: int
    hop: int
    win_length: int
    window_type: str = "hann"
    # (K*hop, 2F) matmul basis: [cos | -sin] columns, window folded in.
    basis: np.ndarray = field(init=False, repr=False, compare=False)

    def __post_init__(self):
        n_fft, hop = self.n_fft, self.hop
        window = padded_window(self.window_type, self.win_length, n_fft)
        t = np.arange(n_fft, dtype=np.float64)[None, :]
        f = np.arange(n_fft // 2 + 1, dtype=np.float64)[:, None]
        omega = 2.0 * np.pi * f * t / n_fft
        cos_k = np.cos(omega) * window[None, :]          # (F, n_fft)
        sin_k = -np.sin(omega) * window[None, :]         # (F, n_fft)
        k = _cdiv(n_fft, hop)
        pad = k * hop - n_fft
        basis = np.concatenate([cos_k, sin_k], axis=0)   # (2F, n_fft)
        basis = np.pad(basis, ((0, 0), (0, pad)))        # (2F, K*hop)
        object.__setattr__(self, "basis", basis.T.astype(np.float32))

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1

    @functools.partial(jax.jit, static_argnums=0, static_argnames=("pad_mode",))
    def __call__(self, x: jax.Array, pad_mode: str = "reflect"):
        """x: (..., N) waveform -> (real, imag), each (..., F, T).

        T = N // hop + 1 (centre-padded, matching torch.stft center=True).
        """
        n_fft, hop = self.n_fft, self.hop
        half = n_fft // 2
        lead = x.shape[:-1]
        n = x.shape[-1]
        num_frames = n // hop + 1
        k = _cdiv(n_fft, hop)

        if pad_mode == "reflect":
            x = jnp.pad(x, [(0, 0)] * len(lead) + [(half, half)], mode="reflect")
        else:
            x = jnp.pad(x, [(0, 0)] * len(lead) + [(half, half)])
        # Right-pad so every frame's K row-slices exist.
        need = (num_frames - 1 + k) * hop
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, max(0, need - x.shape[-1]))])
        x = x[..., :need]

        rows = x.reshape(*lead, -1, hop)                       # (..., M, hop)
        frames = jnp.concatenate(
            [rows[..., i : i + num_frames, :] for i in range(k)], axis=-1
        )                                                      # (..., T, K*hop)
        # DSP fidelity requires full fp32 accumulation (the platform default
        # matmul precision is bf16-class).
        spec = jnp.matmul(frames, jnp.asarray(self.basis), precision="highest")
        spec = jnp.swapaxes(spec, -1, -2)                      # (..., 2F, T)
        f = self.num_bins
        return spec[..., :f, :], spec[..., f:, :]


@dataclass(frozen=True)
class IstftKernel:
    """Precomputed inverse STFT constants.

    Matches the reference's pinv-basis + window-sum normalization
    (/root/reference/F5_TTS/STFT_Process.py:101-133): the synthesis basis is
    window * pinv(fourier_basis * n_fft / hop).T and the overlap-add output is
    multiplied by n_fft / (window_sum * hop + 1e-7).
    """

    n_fft: int
    hop: int
    win_length: int
    window_type: str = "hann"
    basis: np.ndarray = field(init=False, repr=False, compare=False)   # (2F, K*hop)
    win_sq: np.ndarray = field(init=False, repr=False, compare=False)  # (n_fft,)

    def __post_init__(self):
        n_fft, hop = self.n_fft, self.hop
        window = padded_window(self.window_type, self.win_length, n_fft)
        fb = _dft_basis(n_fft)                                  # (2F, n_fft)
        inv = np.linalg.pinv(fb * n_fft / hop).T                # (2F, n_fft)
        inv = inv * window[None, :]
        k = _cdiv(n_fft, hop)
        inv = np.pad(inv, ((0, 0), (0, k * hop - n_fft)))
        object.__setattr__(self, "basis", inv.astype(np.float32))

        orig = make_window(self.window_type, self.win_length).astype(np.float64)
        wn = orig / np.abs(orig).max()
        if self.win_length < n_fft:
            left = (n_fft - self.win_length) // 2
            wsq = np.pad(wn**2, (left, n_fft - self.win_length - left))
        else:
            wsq = wn**2
        object.__setattr__(self, "win_sq", wsq.astype(np.float64))

    @property
    def num_bins(self) -> int:
        return self.n_fft // 2 + 1

    def _window_sum_inv(self, num_frames: int) -> np.ndarray:
        n = self.n_fft + self.hop * (num_frames - 1)
        wsum = np.zeros(n, dtype=np.float64)
        for i in range(num_frames):
            s = i * self.hop
            wsum[s : s + self.n_fft] += self.win_sq[: max(0, min(self.n_fft, n - s))]
        return (self.n_fft / (wsum * self.hop + 1e-7)).astype(np.float32)

    @functools.partial(jax.jit, static_argnums=0)
    def __call__(self, real: jax.Array, imag: jax.Array) -> jax.Array:
        """(real, imag): (..., F, T) -> waveform (..., (T-1)*hop) centre-cropped.

        Matches torch.istft(center=True) output length for win==n_fft inputs.
        """
        n_fft, hop = self.n_fft, self.hop
        half = n_fft // 2
        spec = jnp.concatenate([real, imag], axis=-2)           # (..., 2F, T)
        lead = spec.shape[:-2]
        num_frames = spec.shape[-1]
        k = _cdiv(n_fft, hop)

        frames = jnp.matmul(
            jnp.swapaxes(spec, -1, -2), jnp.asarray(self.basis), precision="highest"
        )
        # (..., T, K*hop) -> K chunk streams of (..., T*hop)
        chunks = frames.reshape(*lead, num_frames, k, hop)
        total = (num_frames - 1 + k) * hop
        out = jnp.zeros((*lead, total), dtype=frames.dtype)
        for i in range(k):
            stream = chunks[..., :, i, :].reshape(*lead, num_frames * hop)
            out = out.at[..., i * hop : i * hop + num_frames * hop].add(stream)

        out = out[..., : n_fft + hop * (num_frames - 1)]
        wsi = jnp.asarray(self._window_sum_inv(num_frames))
        out = out * wsi
        return out[..., half : hop * (num_frames - 1) + n_fft - half]

    def from_mag_phase(self, magnitude: jax.Array, phase: jax.Array) -> jax.Array:
        """istft_A variant: inputs (magnitude, phase), each (..., F, T)."""
        return self(magnitude * jnp.cos(phase), magnitude * jnp.sin(phase))


# Functional conveniences -----------------------------------------------------

@functools.lru_cache(maxsize=32)
def _stft_kernel(n_fft, hop, win_length, window_type) -> StftKernel:
    return StftKernel(n_fft, hop, win_length, window_type)


@functools.lru_cache(maxsize=32)
def _istft_kernel(n_fft, hop, win_length, window_type) -> IstftKernel:
    return IstftKernel(n_fft, hop, win_length, window_type)


def stft(x, n_fft, hop, win_length=None, window_type="hann", pad_mode="reflect"):
    """One-shot STFT -> (real, imag), each (..., n_fft//2+1, N//hop+1)."""
    kern = _stft_kernel(n_fft, hop, win_length or n_fft, window_type)
    return kern(x, pad_mode=pad_mode)


def istft(real, imag, n_fft, hop, win_length=None, window_type="hann"):
    """One-shot ISTFT from (real, imag) -> waveform (..., (T-1)*hop)."""
    kern = _istft_kernel(n_fft, hop, win_length or n_fft, window_type)
    return kern(real, imag)
