"""Pallas fused grouped-conv position embedding for the F5 DiT.

The F5 input embedding ends with conv_pos_embed: two 31-tap grouped conv1d
layers (1024 ch, 16 groups) with mish between and a residual add
(reference modules.py:167-189). The im2col formulation
(models/f5._grouped_conv_mm) materializes a (g, B*T, K*cin) column tensor
— ~178 MB of HBM traffic per conv per step, ~2 ms of the ~17 ms NFE step
at T=1408.

Key structural fact: a grouped conv chain is GROUP-LOCAL — group gi of
conv2 reads only group gi of conv1's output. So the whole
conv1 -> mish -> conv2 -> mish -> +residual chain fuses into one kernel
over a (B, g) grid: each program holds its (cin, T) channel slice in VMEM,
builds the shifted column matrix there, runs two full-depth MXU dots with
the mish epilogue in-register, and writes the residual sum. HBM traffic
drops to one read + one write of x.

Layout: TPU blocks need the last dim to be 128-divisible or full-size, and
cin_pg = 64 < 128 — so the kernel runs CHANNEL-MAJOR: callers pass x as
(B, g, cin, T) (T on the lanes) and the kernel computes
y^T = W^T @ col^T, i.e. (cin, K*cin) @ (K*cin, T): full 1984-deep
contraction, T-wide output. The two (B,T,C) <-> (B,g,cin,T) relayouts
outside the kernel cost ~60 us total vs the ~2 ms saved.

Numerics match the im2col path op-for-op: dots accumulate fp32, are cast
to the input dtype, bias is added post-cast, and mish rounds per-op in the
input dtype (the same sequence XLA executes for _grouped_conv_mm + the
jnp mish) — parity-tested in tests/test_conv_ops.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv_pos_embed_fused"]


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, xp_ref, col_ref,
            *, k: int, t: int, cin: int):
    pad_l = (k - 1) // 2

    def conv(src, w_ref, b_ref):
        # src (cin, t) channel-major. Build col^T (k*cin, t) in VMEM from a
        # zero-padded copy: col^T[kk*cin:(kk+1)*cin, :] = xp[:, kk : kk+t].
        xp_ref[...] = jnp.zeros_like(xp_ref)
        xp_ref[:, pad_l:pad_l + t] = src
        for i in range(k):
            col_ref[i * cin:(i + 1) * cin, :] = xp_ref[:, i:i + t]
        y = jax.lax.dot_general(
            w_ref[0], col_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (cin, t)
        return y.astype(src.dtype) + b_ref[0][:, :1]

    def mish(c):
        # fp32 inside (Mosaic lacks bf16 NaN-compares in jax.nn.softplus);
        # one rounding to c.dtype at the end — within the parity tolerance
        # of XLA's per-op bf16 chain
        cf = c.astype(jnp.float32)
        sp = jnp.where(cf > 20.0, cf, jnp.log1p(jnp.exp(cf)))
        return (cf * jnp.tanh(sp)).astype(c.dtype)

    h = x_ref[0, 0]                                    # (cin, t)
    c = mish(conv(h, w1_ref, b1_ref))
    c = mish(conv(c, w2_ref, b2_ref))
    o_ref[0, 0] = c + h


@functools.partial(jax.jit, static_argnames=("groups", "interpret"))
def conv_pos_embed_fused(x: jax.Array, w1: jax.Array, b1: jax.Array,
                         w2: jax.Array, b2: jax.Array,
                         groups: int = 16, interpret: bool = False
                         ) -> jax.Array:
    """x (B, T, C); w1/w2 (K, C//groups, C); b1/b2 (C).
    Returns mish(conv2(mish(conv1(x)))) + x, 'same'-padded, exactly the
    _grouped_conv_mm chain in models/f5.input_embedding."""
    b, t, c = x.shape
    kk, cin, cout = w1.shape
    assert c == cout and c % groups == 0 and cin == c // groups
    cpg = c // groups

    def wg(w):
        # (K, cin_pg, cout) -> per-group transposed (g, cout_pg, K*cin_pg)
        w4 = w.reshape(kk, cin, groups, cpg).transpose(2, 3, 0, 1)
        return w4.reshape(groups, cpg, kk * cin).astype(x.dtype)

    w1g, w2g = wg(w1), wg(w2)
    # bias along the channel (sublane) dim: (g, cpg, 1) broadcast over T
    b1g = b1.reshape(groups, cpg, 1).astype(x.dtype)
    b2g = b2.reshape(groups, cpg, 1).astype(x.dtype)

    # channel-major view: (B, T, g, cpg) -> (B, g, cpg, T)
    xt = x.reshape(b, t, groups, cpg).transpose(0, 2, 3, 1)

    kernel = functools.partial(_kernel, k=kk, t=t, cin=cpg)
    out = pl.pallas_call(
        kernel,
        grid=(b, groups),
        in_specs=[
            pl.BlockSpec((1, 1, cpg, t), lambda ib, ig: (ib, ig, 0, 0)),
            pl.BlockSpec((1, cpg, kk * cpg), lambda ib, ig: (ig, 0, 0)),
            pl.BlockSpec((1, cpg, 1), lambda ib, ig: (ig, 0, 0)),
            pl.BlockSpec((1, cpg, kk * cpg), lambda ib, ig: (ig, 0, 0)),
            pl.BlockSpec((1, cpg, 1), lambda ib, ig: (ig, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, cpg, t), lambda ib, ig: (ib, ig, 0, 0)),
        out_shape=jax.ShapeDtypeStruct(xt.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((cpg, t + kk - 1), x.dtype),      # padded input
            pltpu.VMEM((kk * cpg, t), x.dtype),          # column matrix
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(xt, w1g, b1g, w2g, b2g)
    return out.transpose(0, 3, 1, 2).reshape(b, t, c)
