"""Pallas decode-step GQA attention that reads only the valid KV prefix.

At decode (S=1) the XLA path (nn/attention.gqa_attention) contracts the
query against the FULL static (B, KVH, max_T, D) cache buffers every
step — the mask zeroes invalid scores but the HBM reads still happen, so
a layer at kv bucket 2048 pays ~8 MB of k/v traffic even when 200
positions are live. This kernel streams k/v in blocks with the block
index CLAMPED to the last valid block (scalar-prefetched kv_len): the
grid revisit rule turns every out-of-range step into a no-DMA no-op, so
HBM traffic is proportional to the live length, not the bucket.

Status: MEASURED NET LOSS on the Qwen3-TTS talker (1.56 -> 1.88 ms
int8 step at kv 128-168/2048, benchmarks/qwen_profile.py talker_fattn)
and therefore opt-in (qwen3_stack_step fused="attn"/"all"): the ~8
mostly-idle grid steps per layer cost more than the dense read they
avoid once the runtime already buckets each decode's KV to its
reachable length (kv/cache.py round-2 fix). Kept as the tested lever
for long-context decode (multi-minute synthesis at kv >> 2048), where
the bucket-proportional dense read grows and this kernel's traffic
stays at the live length.

Numerics match gqa_attention: fp32 scores, -1e30 masking, fp32 softmax
statistics (online/flash form), probabilities cast to the value dtype
before the PV contraction. Parity-tested in tests/test_decode_kernels.py;
on-chip bf16 fidelity is ~1 ulp like ops/flash_attention.py (the
reassociation of the softmax normalization differs from the one-shot
jax.nn.softmax by fp32 rounding only).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["decode_gqa_attention"]

NEG_INF = -1e30


def _kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, bkv: int, scale: float):
    i = pl.program_id(1)
    nkv = pl.num_programs(1)
    kv_len = kvlen_ref[0]
    last = (kv_len - 1) // bkv

    @pl.when(i == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(i <= last)
    def _():
        q = q_ref[0]                                   # (KVH, G, D)
        k = k_ref[0]                                   # (KVH, bkv, D)
        v = v_ref[0]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                              # (KVH, G, bkv)
        if scale != 1.0:
            s = s * scale
        kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + i * bkv
        s = jnp.where(kv_idx < kv_len, s, NEG_INF)

        m_prev = m_ref[..., :1]                        # (KVH, G, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)

        l_new = l_ref[..., :1] * alpha \
            + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == nkv - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[..., :1]).astype(o_ref.dtype)


def decode_gqa_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         kv_len, *, scale: float = 1.0, block_kv: int = 256,
                         interpret: bool = False) -> jax.Array:
    """q (B, H, D) single-step queries (roped/scaled upstream); k, v
    (B, KVH, T, D) static cache buffers; kv_len scalar int32 — valid
    positions INCLUDING the step's own appended k/v (>= 1). Returns
    (B, H, D). Heads are grouped kvh-major like gqa_attention
    (h = kvh * G + g). Falls back to smaller blocks when T < block_kv;
    requires T % block divisible (static buckets are powers of two)."""
    b, h, d = q.shape
    kvh, t = k.shape[1], k.shape[2]
    g = h // kvh
    if h % kvh:
        raise ValueError(f"heads {h} not a multiple of kv heads {kvh}")
    bkv = min(block_kv, t)
    if t % bkv:
        raise ValueError(f"kv buffer {t} must divide block_kv {bkv}")
    nkv = t // bkv
    qr = q.reshape(b, kvh, g, d)
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, bkv=bkv, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, nkv),
            in_specs=[
                pl.BlockSpec((1, kvh, g, d),
                             lambda ib, ikv, kvlen: (ib, 0, 0, 0)),
                pl.BlockSpec(
                    (1, kvh, bkv, d),
                    lambda ib, ikv, kvlen: (
                        ib, 0,
                        jnp.minimum(ikv, (kvlen[0] - 1) // bkv), 0)),
                pl.BlockSpec(
                    (1, kvh, bkv, d),
                    lambda ib, ikv, kvlen: (
                        ib, 0,
                        jnp.minimum(ikv, (kvlen[0] - 1) // bkv), 0)),
            ],
            out_specs=pl.BlockSpec((1, kvh, g, d),
                                   lambda ib, ikv, kvlen: (ib, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((kvh, g, 128), jnp.float32),   # running max
                pltpu.VMEM((kvh, g, 128), jnp.float32),   # running denom
                pltpu.VMEM((kvh, g, d), jnp.float32),     # output accum
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(kv_len, qr, k, v)
    return out.reshape(b, h, d)
