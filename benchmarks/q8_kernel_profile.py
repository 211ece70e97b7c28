#!/usr/bin/env python
"""Ablation profile of the W8A8 fused kernels (ops/dit_mlp.mlp_block_fused_q8,
ops/quant_matmul.ln_qkv_q8) at the F5 bench shape (T=1408, batch-2 CFG).

This script times kernel variants with individual epilogue pieces removed
(LN, quantize, gelu, rescale) to find where the non-matmul time goes. Each
variant is a full pallas_call copy — ablations inside one kernel keep
Mosaic's real scheduling context.

MEASURED (TPU v5e, 2026-08-20, 256-iter scan diff, best-of-6):
  full       0.0775 ms/iter   (tanh_f32 gelu)
  no_gelu    0.0792 ms/iter   (within noise of full — the gelu is FREE:
             Mosaic overlaps the VPU epilogue with the int8 MXU dots)
  gelu_sig   0.0924 ms/iter   (x*sigmoid(1.702x) approx is SLOWER, and
             changes outputs — do not ship)
  dots_only  ~0.073 ms/iter   (int8 matmul floor at this shape)
Conclusion: the fused W8A8 MLP kernel runs within ~6% of its int8 dot
floor; the whole LN+quant+gelu+rescale epilogue is hidden behind the MXU.
An earlier ~0.23 ms/block reading was compile-time contamination. No
epilogue lever remains here.

Run: python benchmarks/q8_kernel_profile.py [variant ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tts_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

T = 1408
B = 2
D = 1024
F = 2048
N1, N2 = 32, 288  # 256-iter diff: tunnel +-2 ms => ~0.008 ms/iter noise


INTERPRET = os.environ.get("Q8_PROFILE_INTERPRET", "") == "1"


def _mk(kernel, x, mods, w1, s1, b1, w2, s2, b2, bs=160):
    b, t, d = x.shape
    f = w1.shape[1]
    return pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(b, t // bs),
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda ib, it: (ib, it, 0)),
            pl.BlockSpec((1, 3, d), lambda ib, it: (0, 0, 0)),
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
    )(x, mods, w1, s1, b1, w2, s2, b2)


def _body(x_ref, mods_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
          o_ref, *, ln="two_pass", quant="dynamic", gelu="tanh_f32"):
    x = x_ref[0]
    m = mods_ref[0]
    shift, scale, gate = m[0], m[1], m[2]

    xf = x.astype(jnp.float32)
    if ln == "two_pass":
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        n = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    elif ln == "one_pass":
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        m2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = m2 - jnp.square(mean)
        n = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    else:  # none
        n = xf
    n = n * (1 + scale[None, :].astype(jnp.float32)) \
        + shift[None, :].astype(jnp.float32)

    if quant == "dynamic":
        amax = jnp.max(jnp.abs(n), axis=-1, keepdims=True)
        xs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        nq = jnp.clip(jnp.round(n / xs), -127, 127).astype(jnp.int8)
    else:  # fixed scale: isolates the amax reduce + divide cost
        xs = jnp.float32(0.05)
        nq = jnp.clip(jnp.round(n * 20.0), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        nq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    h = acc.astype(jnp.float32) * xs * s1_ref[0] + b1_ref[0]
    if gelu == "tanh_f32":
        h = jax.nn.gelu(h, approximate=True)
    elif gelu == "tanh_bf16":
        h = jax.nn.gelu(h.astype(jnp.bfloat16),
                        approximate=True).astype(jnp.float32)
    elif gelu == "relu":   # isolates the tanh/exp transcendental cost
        h = jnp.maximum(h, 0.0)
    elif gelu == "sig":    # x*sigmoid(1.702x): the cheap gelu approx
        h = h * jax.nn.sigmoid(1.702 * h)
    elif gelu == "sig_exp2":   # same, explicit exp2 form
        h = h / (1.0 + jnp.exp2(jnp.float32(-1.702 * 1.4426950408889634)
                                * h))
    elif gelu == "tanh_exp2":  # exact tanh-gelu, tanh rewritten via exp2:
        # tanh(y) = 1 - 2/(exp2(2*log2e*y)+1)
        c = 0.7978845608028654
        u = c * (h + 0.044715 * h * h * h)
        t = jnp.exp2(jnp.float32(2 * 1.4426950408889634) * u)
        h = 0.5 * h * (2.0 - 2.0 / (t + 1.0))
    # else: none

    if quant == "dynamic":
        hmax = jnp.max(jnp.abs(h), axis=-1, keepdims=True)
        hs = jnp.maximum(hmax, 1e-8) * (1.0 / 127.0)
        hq = jnp.clip(jnp.round(h / hs), -127, 127).astype(jnp.int8)
    else:
        hs = jnp.float32(0.05)
        hq = jnp.clip(jnp.round(h * 20.0), -127, 127).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc2.astype(jnp.float32) * hs * s2_ref[0] + b2_ref[0]
    o_ref[0] = x + gate[None, :] * y.astype(x.dtype)


def _body_dots_only(x_ref, mods_ref, w1_ref, s1_ref, b1_ref, w2_ref, s2_ref,
                    b2_ref, o_ref):
    """int8 matmul floor: pre-quantized-looking input, no LN/quant/gelu."""
    x = x_ref[0]
    nq = x.astype(jnp.int8)
    acc = jax.lax.dot_general(
        nq, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    hq = (acc >> 8).astype(jnp.int8)
    acc2 = jax.lax.dot_general(
        hq, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    o_ref[0] = acc2.astype(x.dtype)


def main():
    dt = jnp.bfloat16
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, T, D), dt)
    mods = jax.random.normal(jax.random.key(1), (1, 3, D), dt) * 0.1
    w1 = jax.random.randint(jax.random.key(2), (D, F), -127, 128, jnp.int8)
    w2 = jax.random.randint(jax.random.key(3), (F, D), -127, 128, jnp.int8)
    s1 = (jnp.ones((1, F), jnp.float32) * 1e-3)
    s2 = (jnp.ones((1, D), jnp.float32) * 1e-3)
    b1 = jnp.zeros((1, F), jnp.float32)
    b2 = jnp.zeros((1, D), jnp.float32)

    variants = {
        "full": dict(ln="two_pass", quant="dynamic", gelu="tanh_f32"),
        "ln_one_pass": dict(ln="one_pass", quant="dynamic", gelu="tanh_f32"),
        "no_ln": dict(ln="none", quant="dynamic", gelu="tanh_f32"),
        "fixed_scale": dict(ln="two_pass", quant="fixed", gelu="tanh_f32"),
        "gelu_bf16": dict(ln="two_pass", quant="dynamic", gelu="tanh_bf16"),
        "gelu_relu": dict(ln="two_pass", quant="dynamic", gelu="relu"),
        "no_gelu": dict(ln="two_pass", quant="dynamic", gelu="none"),
        "gelu_sig": dict(ln="two_pass", quant="dynamic", gelu="sig"),
        "gelu_sig_exp2": dict(ln="two_pass", quant="dynamic",
                              gelu="sig_exp2"),
        "gelu_tanh_exp2": dict(ln="two_pass", quant="dynamic",
                               gelu="tanh_exp2"),
        "lean": dict(ln="one_pass", quant="dynamic", gelu="tanh_bf16"),
    }
    names = sys.argv[1:] or (list(variants) + ["dots_only"])

    def timeit(fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(x, n):
            def body(c, _):
                return fn(c), None

            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))

        float(run(x, n=N1))
        float(run(x, n=N2))  # warm BOTH scan lengths before timing
        # Tunnel round-trip variance is +-2 ms; a single (N2-N1)=48-iter
        # difference has +-0.04 ms/iter noise.  Best-of-R on each leg.
        R = 6
        ta = tb = float("inf")
        for _ in range(R):
            t0 = time.perf_counter()
            float(run(x, n=N1))
            ta = min(ta, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(x, n=N2))
            tb = min(tb, time.perf_counter() - t0)
        return (tb - ta) / (N2 - N1) * 1e3

    results = {}
    for name in names:
        if name == "dots_only":
            fn = lambda c: _mk(_body_dots_only, c, mods, w1, s1, b1,
                               w2, s2, b2)
        else:
            kern = functools.partial(_body, **variants[name])
            fn = lambda c, k=kern: _mk(k, c, mods, w1, s1, b1, w2, s2, b2)
        ms = timeit(fn)
        results[name] = ms
        print(f"{name:<16} {ms:8.4f} ms/iter")
    if "full" in results:
        base = results["full"]
        for k, v in results.items():
            if k != "full":
                print(f"  marginal {k:<16} {base - v:+8.4f} ms")


if __name__ == "__main__":
    main()
