"""Pallas fused DiT MLP block: AdaLN-modulated LN -> ff1 -> gelu -> ff2 ->
gated residual, one kernel.

The unfused chain costs four full HBM round-trips over the (B, T, dim)
activations per DiT block (LN+modulate pass, gelu on the (B, T, 4?dim)
hidden, the gated-residual pass) on top of the two matmuls. Both MLP
weight matrices (1024x2048 + 2048x1024 bf16 = 8.4 MB) fit VMEM together,
so one program per (batch, row-block) computes the whole chain with the
activations never leaving VMEM.

Numerics replicate the XLA chain op-for-op (nn/norm.layer_norm fp32
mean/var, modulate in the activation dtype, tanh-approx gelu, bf16 matmul
= fp32 accumulate + round): parity-tested in tests/test_dit_kernels.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mlp_block_fused", "mlp_block_fused_q8"]


def _kernel(x_ref, mods_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[0]                                       # (bs, D)
    m = mods_ref[0]                                    # (3, D)
    shift, scale, gate = m[0], m[1], m[2]

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = ((xf - mean) * jax.lax.rsqrt(var + 1e-6)).astype(x.dtype)
    n = ln * (1 + scale[None, :]) + shift[None, :]

    h = jax.lax.dot_general(
        n, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b1_ref[0]
    h = jax.nn.gelu(h, approximate=True)
    y = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + b2_ref[0]
    o_ref[0] = x + gate[None, :] * y


def _kernel_q8(x_ref, mods_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
               b2_ref, o_ref):
    """W8A8 variant: int8 weights stay int8 in VMEM (half the residency of
    bf16) and both matmuls run on the int8 MXU path (~1.4x the bf16 dot).
    Activations are quantized per row (symmetric, 127) right before each
    dot; the fp32 rescale (row scale x per-out-channel weight scale), bias,
    gelu, and gated residual all stay in-kernel, so none of XLA's epilogue
    fusion is lost — the failure mode that made the standalone
    ops/quant_matmul.py kernel a net loss end-to-end."""
    x = x_ref[0]                                       # (bs, D)
    m = mods_ref[0]                                    # (3, D)
    shift, scale, gate = m[0], m[1], m[2]

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    n = ln * (1 + scale[None, :].astype(jnp.float32)) \
        + shift[None, :].astype(jnp.float32)           # (bs, D) fp32

    amax = jnp.max(jnp.abs(n), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)       # (bs, 1)
    nq = jnp.clip(jnp.round(n / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        nq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (bs, F) int32
    h = acc.astype(jnp.float32) * xs * s1_ref[0] + b1_ref[0]
    h = jax.nn.gelu(h, approximate=True)               # fp32 VPU

    hmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
    hs = jnp.maximum(hmax, 1e-8) * (1.0 / 127.0)
    hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (bs, D) int32
    y = acc2.astype(jnp.float32) * hs * s2_ref[0] + b2_ref[0]
    o_ref[0] = x + gate[None, :] * y.astype(x.dtype)




def _mods_spec(mods, b, d):
    """Normalize mods to (Bm, 3, D) with Bm in {1, B} and return
    (array, BlockSpec): (3, D) legacy shared vector, or (B, 3, D) per-row
    (continuous F5 serving — each request at its own NFE step)."""
    if mods.ndim == 2:
        mods = mods[None]
    if mods.shape[0] == 1:
        spec = pl.BlockSpec((1, 3, d), lambda ib, it: (0, 0, 0))
    else:
        assert mods.shape[0] == b, (mods.shape, b)
        spec = pl.BlockSpec((1, 3, d), lambda ib, it: (ib, 0, 0))
    return mods, spec

@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def mlp_block_fused_q8(x: jax.Array, mods: jax.Array, w1_q: jax.Array,
                       w1_scale: jax.Array, b1: jax.Array, w2_q: jax.Array,
                       w2_scale: jax.Array, b2: jax.Array,
                       block_rows: int = 160, interpret: bool = False
                       ) -> jax.Array:
    """W8A8 mlp_block_fused: w1_q (D, F) int8 with per-out-channel fp32
    w1_scale (F,), likewise w2. Activations quantize per row in-kernel.
    Row blocks are multiples of 32 (the int8 sublane tile minimum)."""
    b, t, d = x.shape
    f = w1_q.shape[1]
    bs = t
    for cand in range(min(block_rows, t) // 32 * 32, 31, -32):
        if t % cand == 0:
            bs = cand
            break
    grid = (b, t // bs)
    mods, mspec = _mods_spec(mods, b, d)
    return pl.pallas_call(
        _kernel_q8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
            mspec,
            pl.BlockSpec((d, f), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, f), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, f), lambda ib, it: (0, 0)),
            pl.BlockSpec((f, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, d), lambda ib, it: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, mods.astype(x.dtype), w1_q,
      w1_scale.reshape(1, -1).astype(jnp.float32),
      b1.reshape(1, -1).astype(jnp.float32), w2_q,
      w2_scale.reshape(1, -1).astype(jnp.float32),
      b2.reshape(1, -1).astype(jnp.float32))


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def mlp_block_fused(x: jax.Array, mods: jax.Array, w1: jax.Array,
                    b1: jax.Array, w2: jax.Array, b2: jax.Array,
                    block_rows: int = 176, interpret: bool = False
                    ) -> jax.Array:
    """x (B, T, D); mods (3, D) shared or (B, 3, D) per batch row
    = [shift_mlp, scale_mlp, gate_mlp] rows;
    w1 (D, F), b1 (F,), w2 (F, D), b2 (D,).
    Returns x + gate * ff2(gelu(ff1(ln(x) * (1+scale) + shift)))."""
    b, t, d = x.shape
    f = w1.shape[1]
    # largest divisor of t that is <= block_rows and a multiple of 8 (the
    # TPU block minimum for the sublane dim); t itself (bucketed to 128
    # frames by every caller) as the last resort
    bs = t
    for cand in range(min(block_rows, t) // 8 * 8, 7, -8):
        if t % cand == 0:
            bs = cand
            break
    grid = (b, t // bs)
    mods, mspec = _mods_spec(mods, b, d)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
            mspec,
            pl.BlockSpec((d, f), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, f), lambda ib, it: (0, 0)),
            pl.BlockSpec((f, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, d), lambda ib, it: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, mods.astype(x.dtype), w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
