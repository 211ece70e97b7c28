"""Normalization primitives.

The reference absorbs norm weights into adjacent projections at export time
(SURVEY.md §2.8 item 2 — sum-based RMSNorm with eps*H compensation, weight
folded into the next linear). In this framework the *folding* happens in
weights/fusion.py at load time; the runtime primitive is a plain RMSNorm whose
`weight` argument is None when already absorbed. XLA fuses the rsqrt chain
into the adjacent matmul, so no Pallas kernel is needed here.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rms_norm", "layer_norm", "l2_norm"]


def rms_norm(x: jax.Array, weight: jax.Array | None = None, eps: float = 1e-5):
    """RMSNorm in fp32 accumulation; weight=None means pre-absorbed."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(dtype)


def layer_norm(
    x: jax.Array,
    weight: jax.Array | None = None,
    bias: jax.Array | None = None,
    eps: float = 1e-6,
):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)


def l2_norm(x: jax.Array, eps: float = 1e-12):
    """L2 normalization along the last axis (Vocos LayerNorm trick,
    reference modeling_modified/vocos/models.py:78-83)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf / n).astype(dtype)
