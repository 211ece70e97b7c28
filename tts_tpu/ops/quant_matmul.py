"""Pallas TPU int8 matmul with in-kernel dynamic activation quantization.

The reference's Q8 pipelines quantize matmul weights to int8 and let ORT
run int8 kernels (Optimize_ONNX MatMulNBits/QDQ). On this TPU, XLA's int8
dot is NOT faster than bf16 (the standalone activation-quant pass eats the
gain), but Mosaic's int8 MXU path is ~1.4x the bf16 dot — so this kernel
fuses the whole Q8 matmul: per-row activation abs-max + round to int8 in
VMEM, int8xint8->int32 dot on the MXU, and the fp32 rescale epilogue, all
in one kernel.

MEASURED RESULT (v5e, 2026-08-16): the raw kernel dot is ~1.4x the bf16
dot (138.6 vs 192.3 us at 1024x1024x4096), but routing the F5 DiT's Q8
matmuls through it was a net LOSS end-to-end (RTF 0.083 vs 0.073 bf16) —
the standalone pallas_call breaks XLA's bias/gelu epilogue fusion and adds
launches. Kept as tested infrastructure (e.g. for a future fused
block-level kernel); quant/weight_only.dense does NOT route here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["quantized_matmul", "ln_qkv_q8", "out_proj_residual_q8"]


def _kernel(x_ref, w_ref, ws_ref, o_ref, xq_ref, xs_ref):
    # quantize the x tile once per M-block (the N grid dim is innermost and
    # sequential, so the scratch persists across the row of N-blocks)
    @pl.when(pl.program_id(1) == 0)
    def _():
        x = x_ref[...].astype(jnp.float32)           # (bm, K)
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        xs_ref[...] = xs
        xq_ref[...] = jnp.clip(jnp.round(x / xs), -127, 127
                               ).astype(jnp.int8)

    acc = jax.lax.dot_general(
        xq_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                # (bm, bn) int32
    o_ref[...] = (acc.astype(jnp.float32) * xs_ref[...] * ws_ref[...]
                  ).astype(o_ref.dtype)


def _rows_block(t: int, block_rows: int) -> int:
    """Largest divisor of t that is <= block_rows and a multiple of 32 (the
    int8 sublane tile minimum); t as the last resort."""
    for cand in range(min(block_rows, t) // 32 * 32, 31, -32):
        if t % cand == 0:
            return cand
    return t


def _ln_qkv_kernel(x_ref, mods_ref, w_ref, ws_ref, b_ref, o_ref):
    """AdaLN-modulated LN -> per-row int8 quantize -> int8 qkv matmul with
    the fp32 rescale/bias epilogue in-kernel (see dit_mlp._kernel_q8 for
    why the epilogue must stay in-kernel)."""
    x = x_ref[0].astype(jnp.float32)                   # (bs, D)
    shift, scale = mods_ref[0], mods_ref[1]            # (D,) fp32

    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    n = (x - mean) * jax.lax.rsqrt(var + 1e-6)
    n = n * (1 + scale[None, :]) + shift[None, :]

    amax = jnp.max(jnp.abs(n), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    nq = jnp.clip(jnp.round(n / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        nq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (bs, 3HD) int32
    o_ref[0] = (acc.astype(jnp.float32) * xs * ws_ref[0] + b_ref[0]
                ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def ln_qkv_q8(x: jax.Array, mods: jax.Array, w_q: jax.Array,
              w_scale: jax.Array, b: jax.Array, block_rows: int = 160,
              interpret: bool = False) -> jax.Array:
    """x (B, T, D); mods (2, D) = [shift_msa, scale_msa]; w_q (D, N) int8
    with per-out-channel fp32 w_scale (N,); b (N,).
    Returns dense(LN(x)*(1+scale)+shift) + b as (B, T, N) in x.dtype."""
    bsz, t, d = x.shape
    n = w_q.shape[1]
    bs = _rows_block(t, block_rows)
    return pl.pallas_call(
        _ln_qkv_kernel,
        grid=(bsz, t // bs),
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
            pl.BlockSpec((2, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((d, n), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, n), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, n), lambda ib, it: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, n), lambda ib, it: (ib, it, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, t, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, mods.astype(jnp.float32), w_q,
      w_scale.reshape(1, -1).astype(jnp.float32),
      b.reshape(1, -1).astype(jnp.float32))


def _out_proj_kernel(o_ref, w_ref, ws_ref, b_ref, gate_ref, xres_ref, y_ref):
    """Per-row int8 quantize -> int8 out-proj -> rescale/bias -> gated
    residual add, one kernel (the residual add is the epilogue XLA would
    otherwise have fused into the matmul)."""
    o = o_ref[0].astype(jnp.float32)                   # (bs, HD)
    amax = jnp.max(jnp.abs(o), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
    oq = jnp.clip(jnp.round(o / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        oq, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                                  # (bs, D) int32
    y = acc.astype(jnp.float32) * xs * ws_ref[0] + b_ref[0]
    x = xres_ref[0]
    y_ref[0] = x + gate_ref[0].astype(x.dtype) * y.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def out_proj_residual_q8(o: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                         b: jax.Array, gate: jax.Array, x_res: jax.Array,
                         block_rows: int = 160,
                         interpret: bool = False) -> jax.Array:
    """o (B, T, HD) attention output; w_q (HD, D) int8 + fp32 w_scale (D,);
    b (D,); gate (D,); x_res (B, T, D) residual input.
    Returns x_res + gate * (o @ w + b) in x_res.dtype."""
    bsz, t, hd = o.shape
    d = w_q.shape[1]
    bs = _rows_block(t, block_rows)
    return pl.pallas_call(
        _out_proj_kernel,
        grid=(bsz, t // bs),
        in_specs=[
            pl.BlockSpec((1, bs, hd), lambda ib, it: (ib, it, 0)),
            pl.BlockSpec((hd, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, d), lambda ib, it: (0, 0)),
            pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
        out_shape=jax.ShapeDtypeStruct(x_res.shape, x_res.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(o, w_q, w_scale.reshape(1, -1).astype(jnp.float32),
      b.reshape(1, -1).astype(jnp.float32),
      gate.reshape(1, -1).astype(jnp.float32), x_res)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def quantized_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                     block_m: int = 256, block_n: int = 512) -> jax.Array:
    """x (M, K) float -> x @ (w_q * w_scale) via int8 MXU. w_q (K, N) int8,
    w_scale (N,) fp32 per-output-channel. M and N must divide the blocks
    (callers pad or fall back)."""
    m, k = x.shape
    n = w_q.shape[1]
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    if m % block_m or n % block_n:
        raise ValueError(f"({m}, {n}) must divide blocks "
                         f"({block_m}, {block_n})")
    return pl.pallas_call(
        _kernel,
        grid=(m // block_m, n // block_n),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, k), jnp.int8),      # quantized x tile
            pltpu.VMEM((block_m, 1), jnp.float32),   # per-row scales
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, w_q, w_scale.reshape(1, -1).astype(jnp.float32))
