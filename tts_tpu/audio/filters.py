"""Kaiser-windowed sinc low-pass filters + anti-aliased 2x resampling.

Behavioral spec from the reference's pure-tensor re-expression of BigVGAN's
alias-free activation (the component that is a CUDA kernel upstream —
/root/reference/BigVGAN/modeling_modified/filter.py:30-63, resample.py:11-52):
upsample2x = zero-stuffed transposed depthwise conv against a kaiser-sinc
filter (x ratio), downsample2x = strided depthwise conv against the same
design. Filter design is the standard Kaiser-attenuation formula.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.conv import conv1d, conv_transpose1d

__all__ = ["kaiser_sinc_filter", "AliasFreeResample"]


@functools.lru_cache(maxsize=32)
def kaiser_sinc_filter(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Length-`kernel_size` zero-phase low-pass, normalized to unit DC gain."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, dtype=np.float32)
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


class AliasFreeResample:
    """2x (or Rx) up/down resampling pair used around snake activations.

    TPU design: the upsample's zero-stuffed transposed conv is decomposed into
    R polyphase branches — R dense (K/R)-tap depthwise convs interleaved back —
    so no lhs-dilated conv appears; the downsample is a strided depthwise conv.
    Both are (B, T, C) ops whose channel dim rides the vector lanes.
    """

    def __init__(self, ratio: int = 2, kernel_size: int | None = None):
        self.ratio = ratio
        self.kernel_size = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
        filt = kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, self.kernel_size)
        self.up_filter = filt * ratio
        self.down_filter = filt
        # torch-equivalent crop amounts for the transposed conv
        self.up_pad = self.kernel_size // ratio - 1
        self.up_crop_left = self.up_pad * ratio + (self.kernel_size - ratio) // 2
        self.up_crop_right = self.up_pad * ratio + (self.kernel_size - ratio + 1) // 2
        self.down_pad_left = self.kernel_size // 2 - (1 if self.kernel_size % 2 == 0 else 0)
        self.down_pad_right = self.kernel_size // 2

    def upsample(self, x: jax.Array) -> jax.Array:
        """(B, T, C) -> (B, R*T, C) anti-aliased upsample.

        zero-pad(up_pad) -> zero-stuffed transposed conv(stride=R) -> crop,
        exactly the reference UpSample1d semantics (resample.py:30-35).

        The filter is a single scalar tap sequence shared by every channel,
        so the depthwise transposed conv is computed as R polyphase branches
        of K/R shifted scalar FMAs, interleaved back — no grouped conv (a
        TPU layout hazard) and no materialized zero-stuffing. Derivation:
        with xp the padded input and phases s = R*u + r,
          y_full[R*u + r] = sum_m xp[u - m] * w[r + R*m].
        """
        r_ = self.ratio
        k = self.kernel_size
        kp = -(-k // r_)
        xp = jnp.pad(x, ((0, 0), (self.up_pad + kp - 1,
                                  self.up_pad + kp - 1), (0, 0)))
        tp = x.shape[1] + 2 * self.up_pad
        u_len = tp + kp - 1
        w = self.up_filter
        phases = []
        for r in range(r_):
            acc = None
            for m in range(kp):
                if r + r_ * m >= k:
                    break
                tap = float(w[r + r_ * m])
                term = xp[:, kp - 1 - m : kp - 1 - m + u_len] * jnp.asarray(
                    tap, x.dtype)
                acc = term if acc is None else acc + term
            phases.append(acc)
        y = jnp.stack(phases, axis=2).reshape(x.shape[0], u_len * r_,
                                              x.shape[-1])
        # polyphase rows cover u_len*R >= the true transposed-conv length
        # (tp-1)*R + K; trim the overhang before the end-relative crop
        # (only reachable when kernel_size is not a multiple of ratio)
        full = (tp - 1) * r_ + k
        y = y[:, :full]
        return y[:, self.up_crop_left : y.shape[1] - self.up_crop_right]

    def downsample(self, x: jax.Array) -> jax.Array:
        """(B, T, C) -> (B, T//R, C) anti-aliased decimation.

        Strided depthwise conv with a channel-shared scalar filter, computed
        over the R-phase reshape: y[t] = sum_{r,m} Z_r[t+m] * w[r + R*m]
        where Z_r[u] = xp[u*R + r]."""
        r_ = self.ratio
        k = self.kernel_size
        kp = -(-k // r_)
        xp = jnp.pad(x, ((0, 0), (self.down_pad_left, self.down_pad_right),
                         (0, 0)))
        tp = xp.shape[1]
        t_out = (tp - k) // r_ + 1
        u_len = t_out + kp                       # phase rows needed
        xp = jnp.pad(xp, ((0, 0), (0, max(0, u_len * r_ - tp)), (0, 0)))
        z = xp[:, : u_len * r_].reshape(x.shape[0], u_len, r_, x.shape[-1])
        w = self.down_filter
        acc = None
        for r in range(r_):
            for m in range(kp):
                if r + r_ * m >= k:
                    break
                tap = float(w[r + r_ * m])
                term = z[:, m : m + t_out, r] * jnp.asarray(tap, x.dtype)
                acc = term if acc is None else acc + term
        return acc

    def alias_free_act(self, x: jax.Array, act) -> jax.Array:
        """Fused 2x-upsample -> act -> 2x-decimate WITHOUT materializing
        the 2x-rate signal: the two upsample polyphase streams stay
        separate (they are the even/odd samples of the 2x signal — the
        interleave is a pure permutation, and `act` is elementwise, so
        act commutes with it), and the decimating filter's taps split by
        the parity of the 2x index they touch. The whole activation
        becomes one shift+FMA elementwise DAG — no stack, no reshape, no
        2x-rate intermediate — which XLA fuses into a single pass.

        Same tap set and padding semantics as upsample()+downsample()
        (summation order differs, so results agree to rounding).
        Profiling motivation: the unfused chain was 87% of BigVGAN's
        runtime (benchmarks/bigvgan_profile.py). Ratio-2 only; other
        ratios fall back to the unfused pair.
        """
        if self.ratio != 2:
            return self.downsample(act(self.upsample(x)))
        k, kp, t = self.kernel_size, -(-self.kernel_size // 2), x.shape[1]
        wu, wd = self.up_filter, self.down_filter

        def phase(p):
            # E/O[t] = y_up[2t + p] = sum_m x[t + o - m] * wu[r + 2m]
            r = (p + self.up_crop_left) % 2
            o = (p + self.up_crop_left - r) // 2 - self.up_pad
            lo, hi = o - (kp - 1), o
            xp = jnp.pad(x, ((0, 0), (max(0, -lo), max(0, hi)), (0, 0)))
            base = max(0, -lo) + o
            acc = None
            for m in range(kp):
                if r + 2 * m >= k:
                    break
                sl = xp[:, base - m : base - m + t]
                term = sl * jnp.asarray(float(wu[r + 2 * m]), x.dtype)
                acc = term if acc is None else acc + term
            return acc

        se, so = act(phase(0)), act(phase(1))
        # y[t] = sum_k' s[2t + k' - dpl] * wd[k']; s[2u] = se[u],
        # s[2u+1] = so[u], zero outside [0, 2T) (the pair's pad semantics:
        # act(0) = 0 for snake-family activations)
        dpl = self.down_pad_left
        offs = [((i0 // 2 if i0 % 2 == 0 else (i0 - 1) // 2), i0 % 2, kk)
                for kk, i0 in ((kk, kk - dpl) for kk in range(k))]
        pad_l = max(0, -min(e for e, _, _ in offs))
        pad_r = max(0, max(e for e, _, _ in offs))
        sep = jnp.pad(se, ((0, 0), (pad_l, pad_r), (0, 0)))
        sop = jnp.pad(so, ((0, 0), (pad_l, pad_r), (0, 0)))
        acc = None
        for e, parity, kk in offs:
            src = sop if parity else sep
            term = src[:, pad_l + e : pad_l + e + t] * jnp.asarray(
                float(wd[kk]), x.dtype)
            acc = term if acc is None else acc + term
        return acc
