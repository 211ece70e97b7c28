#!/usr/bin/env python
"""Ablation profile of ops/flash_attention._kernel_flat epilogue variants.

The flat flash kernel is now the largest single cost of the W8A8 DiT block
(~0.22 of ~0.39 ms at T=1408): its MXU floor is ~0.082 ms, the rest is the
VPU rope prologue + exp2-softmax epilogue. Variants measured here:

  base        — the shipping kernel (scale*log2e applied to the score tile)
  qscale      — scale*log2e folded into q's rope cos/sin tables: the
                (bq, skv) score-tile multiply becomes a (bq, 128) q-tile
                multiply (11x fewer elements at T=1408)
  bf16sm      — qscale + the exp2 softmax computed in bf16 (halves VPU
                lane cost of min/add/exp2; sum keeps fp32 accumulation)
  nodiv       — bf16sm + fold the 1/l normalization into the output concat
                via reciprocal (VPU divide -> multiply)

Accuracy of each variant is reported against the fp32 reference chain.

MEASURED (TPU v5e, 2026-08-20, best-of-6 scan diff):
  base    0.2129 ms/iter  maxabs 2.3e-4
  qscale  0.2327 ms/iter  (folding scale into cos/sin ADDS time: the fp32
          q-rope multiply leaves the (bq,128) tile, losing a fused madd)
  bf16sm  0.2135 ms/iter  (neutral; exp2 lane cost is not the limiter)
  nodiv   0.2463 ms/iter  (reciprocal-multiply in the concat is WORSE than
          the divide Mosaic already schedules)
Conclusion: the shipping kernel is at its floor — every epilogue variant is
neutral or a net loss.  Do not revisit; the remaining flash gap to the MXU
floor (~0.08 ms) is the rope prologue + softmax VPU serial chain that
Mosaic cannot overlap further at D=64.

kvsplitN (round 5, the parked exp2-overlap experiment): the SHIPPING
kernel's opt-in kv_split chunks the kv rows so chunk c+1's score dot is
independent of chunk c's exp2 tail. MEASURED (TPU v5e, 2026-08-20):
isolated-kernel sweeps are noise-dominated (kvsplit2 0.201-0.208 vs
kvsplit1 0.222-0.230; a one-off kvsplit4 0.147 did not reproduce —
0.217/0.216/0.233 for 4/6/8 on the rerun; the min-of-diffs estimator
biases low under tunnel noise), and the DECIDING measurement — the full
bf16 F5 DiT step at T=1408, interleaved 4x passes — shows NO effect:
split 1/2/4 all 10.7-11.2 ms. The exp2 tail is already overlapped by
Mosaic in the full-step context. Verdict: neutral; stays opt-in
(default kv_split=1, bit-stable), experiment closed.

Run: python benchmarks/flash_ablation.py [variant ...]
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

from tts_tpu.ops.flash_attention import NEG_INF, _LOG2E, _rot_half

B, T, H, D = 2, 1408, 16, 64
N1, N2 = 8, 40


def _kernel(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
            bias_ref, o_ref, kr_ref, *, scale: float, d: int,
            variant: str):
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        kf = k_ref[0].astype(jnp.float32)
        kr = kf * ck_ref[...] + _rot_half(kf, d) * sk_ref[...]
        kr_ref[...] = kr.astype(kr_ref.dtype)

    qf = q_ref[0].astype(jnp.float32)
    qr = (qf * cq_ref[...] + _rot_half(qf, d) * sq_ref[...]
          ).astype(q_ref.dtype)
    k = kr_ref[...]
    v = v_ref[0]
    bias = bias_ref[0]

    outs = []
    for base in range(0, qr.shape[-1], d):
        sl = slice(base, base + d)
        s = jax.lax.dot_general(
            qr[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if variant == "base":
            s = jnp.minimum(s * jnp.float32(scale * _LOG2E), 100.0) + bias
            p = jnp.exp2(s)
            l = jnp.sum(p, axis=-1, keepdims=True) + 1e-37
            o = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(o_ref.dtype))
        elif variant == "qscale":
            # scale*log2e pre-folded into cq/sq outside the kernel
            s = jnp.minimum(s, 100.0) + bias
            p = jnp.exp2(s)
            l = jnp.sum(p, axis=-1, keepdims=True) + 1e-37
            o = jax.lax.dot_general(
                p.astype(v.dtype), v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append((o / l).astype(o_ref.dtype))
        elif variant in ("bf16sm", "nodiv"):
            s = (jnp.minimum(s, 100.0) + bias).astype(jnp.bfloat16)
            p = jnp.exp2(s)
            l = jnp.sum(p.astype(jnp.float32), axis=-1,
                        keepdims=True) + 1e-37
            o = jax.lax.dot_general(
                p, v[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if variant == "nodiv":
                outs.append((o * (1.0 / l)).astype(o_ref.dtype))
            else:
                outs.append((o / l).astype(o_ref.dtype))
        else:
            raise ValueError(variant)
    o_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("heads", "scale", "variant"))
def flash_variant(qkv, rope_cos, rope_sin, *, heads: int, scale: float,
                  variant: str):
    b, t, n3 = qkv.shape
    d = rope_cos.shape[-1]
    hb = 128 // d
    h = heads
    nh = h // hb
    bias = jnp.full((b, 1, t), -30.0, jnp.float32)

    reps = 128 // d
    cos2 = jnp.tile(rope_cos.astype(jnp.float32), (1, reps))
    sin2 = jnp.tile(rope_sin.astype(jnp.float32), (1, reps))
    if variant == "base":
        cq, sq = cos2, sin2
        kern_scale = scale
    else:
        f = jnp.float32(scale * _LOG2E)
        cq, sq = cos2 * f, sin2 * f
        kern_scale = 1.0

    block_q = 128
    kv_bytes = 5 * t * 128 * qkv.dtype.itemsize + 2 * t * 128 * 4
    for cand in range(min(t, 1024), 127, -8):
        if t % cand == 0 and cand * t * 4 + kv_bytes <= 14 << 20:
            block_q = cand
            break

    grid = (b, nh, t // block_q)
    kernel = functools.partial(_kernel, scale=kern_scale, d=d,
                               variant=variant)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda ib, ih, iq: (ib, iq, ih)),
            pl.BlockSpec((1, t, 128),
                         lambda ib, ih, iq, _nh=nh: (ib, 0, _nh + ih)),
            pl.BlockSpec((1, t, 128),
                         lambda ib, ih, iq, _nh=nh: (ib, 0, 2 * _nh + ih)),
            pl.BlockSpec((block_q, 128), lambda ib, ih, iq: (iq, 0)),
            pl.BlockSpec((block_q, 128), lambda ib, ih, iq: (iq, 0)),
            pl.BlockSpec((t, 128), lambda ib, ih, iq: (0, 0)),
            pl.BlockSpec((t, 128), lambda ib, ih, iq: (0, 0)),
            pl.BlockSpec((1, 1, t), lambda ib, ih, iq: (ib, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 128),
                               lambda ib, ih, iq: (ib, iq, ih)),
        out_shape=jax.ShapeDtypeStruct((b, t, h * d), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((t, 128), qkv.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qkv, qkv, qkv, cq, sq, cos2, sin2, bias)


def main():
    dt = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    key = jax.random.PRNGKey(0)
    qkv = (jax.random.normal(key, (B, T, 3 * H * D), jnp.float32) * 0.5
           ).astype(dt)
    ang = jnp.arange(T)[:, None] * jnp.exp(-jnp.arange(D)[None, :] / 10.0)
    cos, sin = jnp.cos(ang).astype(jnp.float32), jnp.sin(ang).astype(
        jnp.float32)
    scale = 1.0 / D ** 0.5

    def timeit(variant):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(x, n):
            def body(c, _):
                o = flash_variant(c, cos, sin, heads=H, scale=scale,
                                  variant=variant)
                eps = jnp.asarray(1e-4, dt)
                return c + jnp.concatenate([o, o, o], -1) * eps, None
            out, _ = jax.lax.scan(body, x, None, length=n)
            return jnp.sum(out.astype(jnp.float32))

        float(run(qkv, n=N1))
        float(run(qkv, n=N2))
        ta = tb = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            float(run(qkv, n=N1))
            ta = min(ta, time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run(qkv, n=N2))
            tb = min(tb, time.perf_counter() - t0)
        return (tb - ta) / (N2 - N1) * 1e3

    # fp32 reference for accuracy deltas
    def ref():
        q, k, v = jnp.split(qkv.astype(jnp.float32), 3, axis=-1)
        qh = q.reshape(B, T, H, D)
        kh = k.reshape(B, T, H, D)
        vh = v.reshape(B, T, H, D)
        def rope(x):
            xr = jnp.concatenate([-x[..., D // 2:], x[..., :D // 2]], -1)
            return x * cos[None, :, None, :] + xr * sin[None, :, None, :]
        qh, kh = rope(qh), rope(kh)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
        return o.reshape(B, T, H * D)

    o_ref = np.asarray(ref(), np.float32)
    names = sys.argv[1:] or ["base", "qscale", "bf16sm", "nodiv",
                             "kvsplit1", "kvsplit2", "kvsplit4"]
    for name in names:
        if name.startswith("kvsplit"):
            # the SHIPPING flash_attention_flat with the opt-in kv_split
            # chunking (independent exp2 per 128-aligned kv chunk — lets
            # Mosaic overlap chunk c+1's score dot with chunk c's exp2
            # tail); kvsplit1 == production default, timed for a
            # like-for-like in-process baseline
            from tts_tpu.ops.flash_attention import flash_attention_flat

            split = int(name[len("kvsplit"):])

            @functools.partial(jax.jit, static_argnames=("n",))
            def run_s(x, n, _split=split):
                def body(c, _):
                    o = flash_attention_flat(c, cos, sin, heads=H,
                                             scale=scale, kv_split=_split)
                    eps = jnp.asarray(1e-4, dt)
                    return c + jnp.concatenate([o, o, o], -1) * eps, None
                out, _ = jax.lax.scan(body, x, None, length=n)
                return jnp.sum(out.astype(jnp.float32))

            float(run_s(qkv, n=N1))
            float(run_s(qkv, n=N2))
            ta = tb = float("inf")
            for _ in range(6):
                t0 = time.perf_counter()
                float(run_s(qkv, n=N1))
                ta = min(ta, time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(run_s(qkv, n=N2))
                tb = min(tb, time.perf_counter() - t0)
            ms = (tb - ta) / (N2 - N1) * 1e3
            o = np.asarray(flash_attention_flat(
                qkv, cos, sin, heads=H, scale=scale, kv_split=split),
                np.float32)
        else:
            ms = timeit(name)
            o = np.asarray(flash_variant(qkv, cos, sin, heads=H,
                                         scale=scale, variant=name),
                           np.float32)
        err = np.abs(o - o_ref).max()
        mad = np.abs(o - o_ref).mean()
        print(f"{name:<8} {ms:8.4f} ms/iter  maxabs {err:.5f} "
              f"mad {mad:.6f}", flush=True)


if __name__ == "__main__":
    main()
