"""Fused BigVGAN AMP resblock — the whole 3-branch chain in VMEM.

One AMPBlock1 (reference BigVGAN/modeling_modified/bigvgan.py:31-147) is,
per dilation branch, act -> conv(k, d) -> act -> conv(k, 1), with the
branches chained through residual adds. Under XLA each op is a separate
HBM pass, and profiling (benchmarks/bigvgan_profile.py) shows the
generator is bound by those passes, not compute: an elementwise pass
over a stage tensor costs the same at every stage (T*C is constant by
construction), so the ~40 passes per stage dominate the 15 ms of conv
MXU work.

This kernel runs one whole resblock per grid step on a halo'd
channel-major (C, Tb + 2H) VMEM tile: the anti-aliased snake is the
phase-space form (audio/filters.alias_free_act — polyphase streams
never interleaved), shifts are static lane rolls, and each conv tap is
one (C_out, C_in) @ (C_in, W) MXU dot accumulated in fp32. HBM traffic
per resblock: one read + one write of x.

Halo: per branch radius = 6 (act) + (k-1)/2*d (conv1) + 6 (act) +
(k-1)/2 (conv2); summed over the sequential branches, <= 96 for the
(k=11, d=(1,3,5)) block. H=128 covers every reference config; rolls
wrap garbage only within the discarded halo margin.

Numerics: dots accumulate fp32 then round to the input dtype before the
bias add (what XLA's conv does); the snake computes in fp32 with one
rounding per act (Mosaic bf16 transcendentals are a known hazard) —
bounded against the XLA chain in tests/test_bigvgan_stage.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..audio.filters import AliasFreeResample

__all__ = ["amp_block_fused", "fusable_stage"]

_H = 128                       # halo (covers k=11, dils (1,3,5))
_S = 32                        # conv staging margin (max tap offset 25)


def _act_plan(rs: AliasFreeResample):
    """Static (offset, tap) lists for the phase-space anti-aliased act."""
    k, kp = rs.kernel_size, rs.kernel_size // 2
    wu, wd = rs.up_filter, rs.down_filter
    up = []
    for p in (0, 1):
        r = (p + rs.up_crop_left) % 2
        o = (p + rs.up_crop_left - r) // 2 - rs.up_pad
        taps = [(o - m, float(wu[r + 2 * m]))
                for m in range(kp) if r + 2 * m < k]
        up.append(taps)
    dn = ([], [])                          # (even->SE, odd->SO)
    for kk in range(k):
        i0 = kk - rs.down_pad_left
        if i0 % 2 == 0:
            dn[0].append((i0 // 2, float(wd[kk])))
        else:
            dn[1].append(((i0 - 1) // 2, float(wd[kk])))
    return up, dn


def _make_kernel(k: int, dils: tuple[int, ...], w: int, tb: int,
                 t_total: int, dtype, up_plan, dn_plan):
    mid = (k - 1) // 2

    def _shift(u, off):
        """u[:, t + off] via a static lane roll (pltpu.roll requires a
        non-negative shift; wrap stays inside the discarded halo)."""
        return u if off == 0 else pltpu.roll(u, (-off) % w, 1)

    def act(u, alpha, recip, crop):
        uf = u.astype(jnp.float32)
        ph = []
        for taps in up_plan:
            acc = None
            for off, tap in taps:
                term = _shift(uf, off) * tap
                acc = term if acc is None else acc + term
            s = jnp.sin(alpha * acc)
            # the reference crops the 2x signal to [0, 2T) before the
            # decimating filter — the phase streams are zero outside
            # [0, T), so crop before the down taps
            ph.append(crop(acc + recip * (s * s)))
        out = None
        for src, taps in zip(ph, dn_plan):
            for off, tap in taps:
                term = _shift(src, off) * tap
                out = term if out is None else out + term
        return out.astype(dtype)

    def conv(u, wt, b, d, stage):
        # Mosaic's lane rotate is 32-bit only, so bf16 shifted reads go
        # through a staging ref: one static-offset write, k static-offset
        # slices (the ops/grouped_conv.py pattern). Stale lanes outside
        # [_S, _S+w) only ever feed positions inside the discarded halo.
        stage[:, _S:_S + w] = u
        acc = None
        for kk in range(k):
            off = (kk - mid) * d
            us = stage[:, _S + off:_S + off + w]
            t = jax.lax.dot_general(
                wt[kk], us, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        return acc.astype(dtype) + b

    def kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref,
               a1_ref, r1_ref, a2_ref, r2_ref, o_ref, xs, stage, sem):
        i = pl.program_id(0)
        pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * tb, w)], xs, sem).start()
        pltpu.make_async_copy(
            x_hbm.at[:, pl.ds(i * tb, w)], xs, sem).wait()
        # XLA semantics crop every intermediate to the sequence [0, T):
        # each act input is zero-padded and each conv 'same'-pads with
        # zeros — but the halo'd tile carries filter tails past the real
        # edges, so every op output is re-masked to the global range
        g = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
             + i * tb - _H)
        valid = (g >= 0) & (g < t_total)
        crop = lambda v: jnp.where(valid, v, jnp.zeros_like(v))
        xcur = xs[...]
        for j, d in enumerate(dils):
            t1 = crop(act(xcur, a1_ref[j].astype(jnp.float32),
                          r1_ref[j].astype(jnp.float32), crop))
            t2 = crop(conv(t1, w1_ref[j], b1_ref[j], d, stage))
            t3 = crop(act(t2, a2_ref[j].astype(jnp.float32),
                          r2_ref[j].astype(jnp.float32), crop))
            xcur = xcur + crop(conv(t3, w2_ref[j], b2_ref[j], 1, stage))
        o_ref[...] = xcur[:, _H:_H + tb]

    return kernel


def fusable_stage(c: int, t: int, dtype) -> bool:
    """The kernel pays off where HBM passes (not MXU work) dominate and
    its VMEM budget holds. The budget is in BYTES, not elements: weight
    residency is 6*k*C^2*itemsize, so the channel gate scales with the
    dtype width — C <= 256 at bf16 (8.6 MB of weights at k=11) but only
    C <= 128 at fp32 (4.3 MB); fp32 at C=192-256 would blow VMEM in
    Mosaic. Tiny T (< one tile) gains nothing."""
    d = jnp.dtype(dtype)
    if d == jnp.dtype(jnp.bfloat16):
        cmax = 256
    elif d == jnp.dtype(jnp.float32):
        cmax = 128
    else:
        return False
    return c <= cmax and t >= 256


@functools.partial(jax.jit, static_argnames=("k", "dils", "interpret"))
def amp_block_fused(x, w1, b1, w2, b2, a1, r1, a2, r2, *,
                    k: int, dils: tuple[int, ...],
                    interpret: bool = False):
    """One AMPBlock1 on (B, T, C) input, fused.

    w1/w2: (len(dils), k, C_in, C_out) conv stacks (convs1 dilated,
    convs2 dilation-1); b1/b2 (len(dils), C); a1/r1/a2/r2 (len(dils), C)
    snake alpha / reciprocal pairs (acts1, acts2). Matches
    models/bigvgan._amp_block with the phase-space activation.
    """
    b, t, c = x.shape
    dtype = x.dtype
    mid = (k - 1) // 2
    # public entry: the static roll/staging margins must cover the
    # requested geometry or wrapped lanes would escape the discarded
    # halo as silent corruption rather than an error
    if mid * max(dils) > _S:
        raise ValueError(
            f"amp_block_fused: conv tap offset {mid * max(dils)} "
            f"(k={k}, dils={dils}) exceeds staging margin {_S}")
    radius = sum(12 + mid * d + mid for d in dils)
    if radius > _H:
        raise ValueError(
            f"amp_block_fused: chained receptive radius {radius} "
            f"(k={k}, dils={dils}) exceeds halo {_H}")
    # channel-major tile: ~1.5 MB per buffer keeps ~8 live intermediates
    # + the weight stacks inside the ~16 MB VMEM (budget is bytes, so
    # the element count scales inversely with the dtype width)
    elems = 786432 * 2 // jnp.dtype(dtype).itemsize
    wlim = max(256, (elems // c) // 128 * 128)
    tb = wlim - 2 * _H
    nt = -(-t // tb)
    tpad = nt * tb + 2 * _H
    xcm = jnp.swapaxes(x, 1, 2)                     # (B, C, T)
    xcm = jnp.pad(xcm, ((0, 0), (0, 0), (_H, tpad - t - _H)))

    # (J, k, C_out, C_in) so each tap is a ready (C_out, C_in) dot operand
    w1t = jnp.swapaxes(w1, 2, 3).astype(dtype)
    w2t = jnp.swapaxes(w2, 2, 3).astype(dtype)
    col = lambda v: v.astype(dtype)[..., None]      # (J, C, 1) broadcast
    rs = AliasFreeResample(2)
    up_plan, dn_plan = _act_plan(rs)

    kern = _make_kernel(k, dils, wlim, tb, t, dtype, up_plan, dn_plan)
    run = pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, tb), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, nt * tb), dtype),
        scratch_shapes=[
            pltpu.VMEM((c, wlim), dtype),
            pltpu.VMEM((c, wlim + 2 * _S), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )

    outs = []
    for bi in range(b):                             # vocoder runs B=1
        y = run(xcm[bi], w1t, col(b1), w2t, col(b2),
                col(a1), col(r1), col(a2), col(r2))
        outs.append(y[:, :t])
    return jnp.swapaxes(jnp.stack(outs), 1, 2)      # (B, T, C)
