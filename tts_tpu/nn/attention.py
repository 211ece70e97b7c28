"""Fused-QKV grouped-query attention with static-length masking.

TPU-native re-design of the reference's attention pattern (SURVEY.md §2.8):
  * QKV fused into one matmul; the 1/sqrt(d) scale is folded into the Q (and
    optionally K) weights at load time (weights/fusion.py), so no runtime
    scaling appears here.
  * GQA runs as a grouped dot_general over (B, KVH, G, S, D) — the reference's
    "5-D broadcast matmul, no repeat_kv" trick maps 1:1 onto einsum.
  * The KV cache is a fixed (max_T) buffer; instead of the reference's sliced
    int8 mask triangles, masking combines causality with `kv_len` on the fly
    from broadcasted_iota — free inside the jitted step.
  * Softmax accumulates in fp32 (reference folds a 0.1/100 fp16-overflow
    guard; bf16 on TPU has fp32 range so the guard is unnecessary).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["gqa_attention", "attention_mask"]


def attention_mask(
    q_len: int,
    kv_max: int,
    q_start,
    kv_len,
    causal: bool = True,
) -> jax.Array:
    """Boolean (q_len, kv_max) mask: True = attend.

    q_start: index of the first query position in the kv timeline.
    kv_len: total valid kv positions (history + current block).
    """
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_max), 1)
    valid = kv_idx < kv_len
    if causal:
        q_idx = jax.lax.broadcasted_iota(jnp.int32, (q_len, kv_max), 0) + q_start
        valid = valid & (kv_idx <= q_idx)
    return valid


def combine_kv_valid(mask: jax.Array, kv_valid: jax.Array | None) -> jax.Array:
    """AND an (S, T) attention mask with a key-validity mask: (T,) shared
    across the batch, or (B, T) per batch row (batched serving) — the
    result broadcasts through gqa_attention's (S, T) / (B, S, T) contract."""
    if kv_valid is None:
        return mask
    if kv_valid.ndim == 2:
        return mask[None] & kv_valid[:, None, :]
    return mask & kv_valid[None, :]


def gqa_attention(
    q: jax.Array,              # (B, S, H, D)
    k: jax.Array,              # (B, KVH, T, D)
    v: jax.Array,              # (B, KVH, T, D)
    mask: jax.Array | None,    # (S, T) or (B, S, T) boolean, True = attend
    scale: float = 1.0,
) -> jax.Array:
    """Returns (B, S, H, D). H must be a multiple of KVH.

    `scale` defaults to 1.0 on the assumption the checkpoint-fusion pass folded
    d^-0.5 into the Q weights; pass d^-0.5 explicitly for unfused weights.
    """
    b, s, h, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    q = q.reshape(b, s, kvh, g, d).transpose(0, 2, 3, 1, 4)   # (B, KVH, G, S, D)

    k = k.astype(q.dtype)
    v = v.astype(q.dtype)
    # (B, KVH, G, S, D) x (B, KVH, T, D) -> (B, KVH, G, S, T)
    # default matmul precision: bf16 operands take the native MXU pass;
    # scores still accumulate in fp32 via preferred_element_type.
    scores = jnp.einsum(
        "bkgsd,bktd->bkgst", q, k,
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:
        scores = scores * scale
    if mask is not None:
        if mask.ndim == 2:
            m = mask[None, None, None]
        else:
            m = mask[:, None, None]
        scores = jnp.where(m, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bkgst,bktd->bkgsd", probs, v)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, s, h, d)
