"""Snake-family periodic activations (BigVGAN / codec decoders).

Behavioral spec from the reference's pure-tensor re-expression of the upstream
CUDA kernel (/root/reference/BigVGAN/modeling_modified/bigvgan.py,
/root/reference/VoxCPM/v1.5/modeling_modified/audio_vae.py:52-72):

  snake(x)      = x + (1/alpha) * sin^2(alpha * x)
  snakebeta(x)  = x + (1/beta)  * sin^2(alpha * x)

with per-channel alpha/beta, optionally stored in log scale (alpha=exp(a)).
Reciprocals are precomputed at weight-load time (the reference's
`alpha_reciprocal` trick) so the hot path is mul/sin/mul/add — pure VPU work
XLA fuses into the surrounding convs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["snake", "snake_beta"]


def snake(x: jax.Array, alpha: jax.Array, alpha_recip: jax.Array | None = None):
    """x: (..., C, T); alpha broadcastable to (C, 1)."""
    if alpha_recip is None:
        alpha_recip = 1.0 / (alpha + 1e-9)
    s = jnp.sin(alpha * x)
    return x + alpha_recip * (s * s)


def snake_beta(
    x: jax.Array,
    alpha: jax.Array,
    beta_recip: jax.Array,
):
    """SnakeBeta with precomputed exp(alpha) and 1/exp(beta) per channel.

    Callers pass alpha already exponentiated when the checkpoint stores
    log-scale parameters (the reference precomputes exp(alpha), 1/exp(beta) at
    export: Qwen_TTS/modeling_modified/...:658-663).
    """
    s = jnp.sin(alpha * x)
    return x + beta_recip * (s * s)
