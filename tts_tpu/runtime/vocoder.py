"""BigVGAN vocoder runtime — the framework's first end-to-end pipeline.

Mirrors the reference's standalone-vocoder contract
(BigVGAN/Export_BigVGAN.py:37-49): mel in, int16 waveform out, timing/RTF
reported. The whole generator is one jitted program; int16 conversion happens
on-device (x32767 + clamp fused into the graph like the reference does).
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.bigvgan import (BigVGANConfig, bigvgan_apply, bigvgan_post,
                              bigvgan_pre, bigvgan_stage, init_params)

__all__ = ["BigVGANVocoder"]


@dataclass
class SynthesisStats:
    wall_s: float
    audio_s: float

    @property
    def rtf(self) -> float:
        return self.wall_s / max(self.audio_s, 1e-9)


class BigVGANVocoder:
    def __init__(self, params=None, cfg: BigVGANConfig | None = None,
                 dtype=jnp.float32, seed: int = 0):
        self.cfg = cfg or BigVGANConfig()
        if params is None:
            params = init_params(self.cfg, jax.random.key(seed), dtype)
        self.params = jax.tree.map(lambda a: a.astype(dtype) if a.dtype.kind == "f" else a, params)
        cfg_ = self.cfg

        @jax.jit
        def _forward(params, mel):
            wav = bigvgan_apply(params, mel.astype(dtype), cfg_)
            return (wav.astype(jnp.float32) * 32767.0).astype(jnp.int16)

        self._forward = _forward

        # staged program pair: same math split at the stage midpoint —
        # the whole-generator graph takes a degraded compile helper >40
        # min at any length (superlinear autotune grind) while each
        # half compiles in ~35 s and single stages in 1-14 s
        # (models/bigvgan.bigvgan_stage docstring). fused=False on
        # purpose: the Pallas resblock kernel is a SECOND grinder on
        # the degraded helper (stage2+ at T>=16384 ground >3 min).
        # Two programs = 2 tunnel dispatches/call instead of the
        # monolith's 1 — negligible vs the 8 of a per-stage chain.
        n = len(cfg_.upsample_rates)
        first = tuple(range((n + 1) // 2))
        second = tuple(range(len(first), n))

        @jax.jit
        def _half1(p, m):
            x = bigvgan_pre(p, m.astype(dtype), cfg_)
            for i in first:
                x = bigvgan_stage(p, x, i, cfg_, fused=False)
            return x

        @jax.jit
        def _half2(p, x):
            for i in second:
                x = bigvgan_stage(p, x, i, cfg_, fused=False)
            wav = bigvgan_post(p, x, cfg_)
            return (wav.astype(jnp.float32) * 32767.0).astype(jnp.int16)

        self._half1, self._half2 = _half1, _half2

    def _forward_staged(self, params, mel):
        return self._half2(params, self._half1(params, mel))

    def __call__(self, mel: np.ndarray) -> np.ndarray:
        """mel: (B, T, num_mels) or (T, num_mels) -> int16 (B, T*up) waveform."""
        if mel.ndim == 2:
            mel = mel[None]
        return np.asarray(self._forward(self.params, jnp.asarray(mel)))

    def benchmark(self, mel_frames: int = 512, iters: int = 50,
                  staged: bool = False) -> dict:
        """Reference benchmark shape: mel (1, 100, 512)
        (BigVGAN/Export_BigVGAN.py:149, README.md:32).

        Sync is a device->host fetch of the last output: over a remote-device
        tunnel `block_until_ready` can ack before execution finishes, so a
        fetch (ordered after every queued step) is the only reliable fence.
        Iterations chain on the previous output so no step can be elided.

        staged=True runs the per-stage program chain instead of the
        monolith (compiles deterministically on a degraded helper; adds
        ~6 ms tunnel dispatch per stage per call — a measured-low
        reading, flagged in the result)."""
        fwd = self._forward_staged if staged else self._forward
        mel = jnp.zeros((1, mel_frames, self.cfg.num_mels), jnp.float32)
        out = fwd(self.params, mel)                              # compile
        np.asarray(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(self.params,
                      mel + out.reshape(-1)[0].astype(jnp.float32) * 0.0)
        np.asarray(out[..., :8])
        wall = (time.perf_counter() - t0) / iters
        n_samples = out.shape[-1]
        audio_s = n_samples / self.cfg.sample_rate
        return {
            "wall_s": wall,
            "samples": int(n_samples),
            "samples_per_sec": n_samples / wall,
            "rtf": wall / audio_s,
            "staged": staged,
        }
