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

__all__ = ["quantized_matmul"]


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
