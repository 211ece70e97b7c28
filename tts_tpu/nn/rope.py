"""Rotary position embeddings.

Tables are precomputed host-side up to max_seq_len (the reference folds them
into graph constants — SURVEY.md §2.8 item 7); applying at a dynamic position
is a dynamic_slice of the table inside the jitted step, which costs nothing.

Two layouts exist in the model zoo:
  * half-split (Llama/Qwen/LFM2): rotate_half swaps halves of head_dim
  * interleaved (F5 DiT): pairs (x0,x1),(x2,x3) rotated — built via
    repeat_interleave'd frequencies (reference Export_F5.py:108-110)
plus Qwen3-TTS's 3-axis interleaved M-RoPE (built separately in the model).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rope_table", "rope_table_interleaved", "apply_rope", "apply_rope_interleaved"]


def rope_table(
    max_seq_len: int,
    head_dim: int,
    base: float = 10000.0,
    scaling: float = 1.0,
    inv_freq: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables, each (max_seq_len, head_dim), half-split layout."""
    if inv_freq is None:
        inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    pos = np.arange(max_seq_len, dtype=np.float64)
    freqs = np.outer(pos, inv_freq)                      # (T, D/2)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return (np.cos(emb) * scaling).astype(np.float32), (np.sin(emb) * scaling).astype(np.float32)


def rope_table_interleaved(
    max_seq_len: int,
    head_dim: int,
    base: float = 10000.0,
    interpolation: float = 1.0,
) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables with repeat-interleaved freqs (F5 DiT convention)."""
    inv_freq = 1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    pos = np.arange(max_seq_len, dtype=np.float64)
    freqs = np.outer(pos, inv_freq) / interpolation      # (T, D/2)
    emb = np.repeat(freqs, 2, axis=-1)                   # (T, D)
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _rotate_pairs(x: jax.Array) -> jax.Array:
    """(..., 2i, 2i+1) -> (-x[2i+1], x[2i])."""
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return rot.reshape(x.shape)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (..., S, H, D) or (..., S, D); cos/sin: (S, D) (broadcast over heads)."""
    if x.ndim == cos.ndim + 2:
        cos = cos[..., :, None, :]
        sin = sin[..., :, None, :]
    return x * cos + _rotate_half(x) * sin


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    if x.ndim == cos.ndim + 2:
        cos = cos[..., :, None, :]
        sin = sin[..., :, None, :]
    return x * cos + _rotate_pairs(x) * sin
