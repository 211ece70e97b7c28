"""Pallas TPU flash attention for the F5 DiT (non-causal full attention).

The DiT hot loop materializes (B, H, S, S) fp32 score tensors at S~2k —
~400 MB of HBM traffic per block per direction, which the stage profile
shows dominates the step (see runtime/f5.py). This kernel computes the
attention output with the standard online-softmax streaming pattern: scores
never leave VMEM, cutting the attention HBM traffic to the q/k/v/o tiles.

Layout: q, k, v (B, H, S, D); optional kv_len masks keys >= kv_len (the
static-bucket validity mask). Softmax statistics are carried across the kv
grid dimension in VMEM scratch — TPU grids execute sequentially with the
last axis fastest, so the scratch persists per (b, h, q-block).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_flat"]

NEG_INF = -1e30


def _kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
            *, bkv: int, scale: float):
    j = pl.program_id(3)
    nkv = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]                                   # (bq, d)
    k = k_ref[0, 0]                                   # (bkv, d)
    v = v_ref[0, 0]                                   # (bkv, d)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                 # (bq, bkv)
    if scale != 1.0:
        s = s * scale

    kv_len = kvlen_ref[0]
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * bkv
    s = jnp.where(kv_idx < kv_len, s, NEG_INF)

    m_prev = m_ref[...]                               # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                            # (bq, bkv)
    alpha = jnp.exp(m_prev - m_new)                   # (bq, 1)

    l_ref[...] = l_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nkv - 1)
    def _():
        o_ref[0, 0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)


_LOG2E = 1.4426950408889634


def _kernel_onepass(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale: float,
                    packed_out: bool = False):
    """Single-kv-block fast path: the whole score row fits in VMEM, so the
    softmax is one pass. Two VPU economies over the classic form (measured
    ~10% of the kernel at S=1408, B2 H16 D64):
      * kv_len masking is a precomputed (1, 1, S) additive bias row (0 valid /
        -1e30 masked) instead of an in-kernel iota+compare+select;
      * no row-max pass: scores are clamped at +100 in the log2 domain and
        exponentiated as exp2(s - 30). The softmax quotient is shift-
        invariant, so this is exact wherever exp2 stays in range: p spans
        up to 2^70 (fine in fp32 and in bf16's 8-bit exponent) and flushes
        to zero only when a scaled logit is below 30-126 in log2 — i.e. a
        natural-log logit below ~-66. Rows whose EVERY valid logit is that
        small degrade to zeros instead of NaN via the +1e-37 denominator
        guard.
    q/k/v blocks carry a head-block axis so several heads share one grid
    program (amortizes per-program overhead; the dots batch on the MXU)."""
    q = q_ref[0]                                      # (hb, bq, d)
    k = k_ref[0]                                      # (hb, skv, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                 # (hb, bq, skv)
    # bias carries the -30 exponent shift for valid keys (NEG_INF masked),
    # so clamp+bias+shift is one fused add chain over the score tile
    s = jnp.minimum(s * jnp.float32(scale * _LOG2E), 100.0) + bias_ref[...]
    p = jnp.exp2(s)
    l = jnp.sum(p, axis=-1, keepdims=True) + 1e-37
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                 # (hb, bq, d)
    o = (o / l).astype(o_ref.dtype)
    if packed_out:
        # write (bq, hb*d) directly into the (B, S, H*D) output — the
        # (B,H,S,D)->(B,S,H,D) relayout happens per-tile in VMEM as a lane
        # concat (Mosaic rejects the transpose+reshape cast) instead of as
        # a full-tensor XLA transpose after the kernel
        hb = o.shape[0]
        o_ref[0] = jnp.concatenate([o[j] for j in range(hb)], axis=-1)
    else:
        o_ref[0] = o


def _flash_onepass(q, k, v, kv_len, scale: float, block_q: int,
                   head_block: int, packed_out: bool = False):
    b, h, s, d = q.shape
    # kv_len scalar -> shared bias row; (B,) vector -> per-batch-row bias
    # (batched serving: each request in the batch has its own valid length)
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(-1)
    bias = jnp.where(jnp.arange(s)[None, :] < kv_len[:, None], -30.0,
                     NEG_INF).astype(jnp.float32)[:, None, :]
    bias = jnp.broadcast_to(bias, (b, 1, s))
    grid = (b, h // head_block, s // block_q)
    kernel = functools.partial(_kernel_onepass, scale=scale,
                               packed_out=packed_out)
    if packed_out:
        out_spec = pl.BlockSpec((1, block_q, head_block * d),
                                lambda ib, ih, iq: (ib, iq, ih))
        out_shape = jax.ShapeDtypeStruct((b, s, h * d), q.dtype)
    else:
        out_spec = pl.BlockSpec((1, head_block, block_q, d),
                                lambda ib, ih, iq: (ib, ih, iq, 0))
        out_shape = jax.ShapeDtypeStruct(q.shape, q.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, head_block, block_q, d),
                         lambda ib, ih, iq: (ib, ih, iq, 0)),
            pl.BlockSpec((1, head_block, s, d),
                         lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, head_block, s, d),
                         lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda ib, ih, iq: (ib, 0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
    )(q, k, v, bias)


def _rot_half(x: jax.Array, d: int) -> jax.Array:
    """Per-head half-split rotate over a (rows, k*d) tile: within each
    d-lane head block, [-x[d/2:], x[:d/2]] — static slices + negate +
    concat (no cross-head wrap; same element math as the XLA flat rope,
    models/f5._rope_qkv_flat)."""
    h = d // 2
    parts = []
    for base in range(0, x.shape[-1], d):
        parts.append(-x[:, base + h:base + d])
        parts.append(x[:, base:base + h])
    return jnp.concatenate(parts, axis=-1)


def _kernel_flat(q_ref, k_ref, v_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                 bias_ref, o_ref, kr_ref, *, scale: float, d: int,
                 kv_split: int = 1):
    """Flat-qkv single-pass flash attention with in-prologue RoPE.

    q/k/v tiles are read straight from the (B, T, 3*H*D) qkv matmul output
    at 128-lane-aligned column offsets (head pairs for d=64), so the
    producing matmul's natural layout feeds the kernel with NO intermediate
    XLA rope pass or (B,T,3H,D)->(B,3H,T,D) relayout — that segment cost a
    full qkv read+write per DiT block. k is roped once per (batch,
    head-pair) into VMEM scratch at iq==0 and reused across q blocks
    (grid's last axis is the q-block index, so the scratch persists)."""
    iq = pl.program_id(2)

    @pl.when(iq == 0)
    def _():
        kf = k_ref[0].astype(jnp.float32)               # (skv, hb*d)
        kr = kf * ck_ref[...] + _rot_half(kf, d) * sk_ref[...]
        kr_ref[...] = kr.astype(kr_ref.dtype)

    qf = q_ref[0].astype(jnp.float32)                   # (bq, hb*d)
    qr = (qf * cq_ref[...] + _rot_half(qf, d) * sq_ref[...]
          ).astype(q_ref.dtype)
    k = kr_ref[...]                                     # (skv, hb*d)
    v = v_ref[0]                                        # (skv, hb*d)
    bias = bias_ref[0]                                  # (1, skv)

    # kv_split > 1: chunk the kv rows (128-lane-aligned edges) so each
    # chunk's score dot (MXU) is independent of the previous chunk's
    # exp2/sum (VPU) — gives Mosaic's scheduler the freedom to overlap
    # the serial exp2 tail (~0.17 of 0.61 ms/block at the F5 shape)
    # with the next chunk's matmul. Changes only fp32 reassociation of
    # the denominator/PV sums (opt-in; the default stays bit-stable).
    skv = k.shape[0]
    nt = skv // 128
    edges = [0] + [128 * ((nt * (c + 1)) // kv_split)
                   for c in range(kv_split)]
    edges[-1] = skv
    outs = []
    for base in range(0, qr.shape[-1], d):
        sl = slice(base, base + d)
        qsl = qr[:, sl]
        ksl = k[:, sl]                                  # (skv, d)
        vsl = v[:, sl]
        ls, pvs = [], []
        for c in range(kv_split):
            rows = slice(edges[c], edges[c + 1])
            s = jax.lax.dot_general(
                qsl, ksl[rows], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                           # (bq, chunk)
            if edges[c]:
                # lane-rotate the bias so the chunk lands at offset 0 —
                # a direct bias[:, rows] slice keeps lane offset edges[c]
                # and the elementwise add is then an invalid-layout mix
                # (Mosaic); a 2-piece lane concat is the legal rotation
                bias_c = jnp.concatenate(
                    [bias[:, edges[c]:], bias[:, :edges[c]]],
                    axis=-1)[:, :edges[c + 1] - edges[c]]
            else:
                bias_c = bias[:, :edges[c + 1]]
            s = jnp.minimum(s * jnp.float32(scale * _LOG2E), 100.0) \
                + bias_c
            p = jnp.exp2(s)
            ls.append(jnp.sum(p, axis=-1, keepdims=True))
            pvs.append(jax.lax.dot_general(
                p.astype(v.dtype), vsl[rows], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ))                                          # (bq, d)
        l = functools.reduce(jnp.add, ls) + 1e-37
        o = functools.reduce(jnp.add, pvs)
        outs.append((o / l).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit,
                   static_argnames=("heads", "scale", "block_q",
                                    "kv_split", "interpret"))
def flash_attention_flat(qkv: jax.Array, rope_cos: jax.Array,
                         rope_sin: jax.Array, kv_len=None, *, heads: int,
                         scale: float = 1.0, block_q: int = 0,
                         kv_split: int = 1,
                         interpret: bool = False) -> jax.Array:
    """Non-causal flash attention over the FLAT qkv tensor.

    qkv: (B, T, 3*H*D) — the qkv matmul output, q|k|v concatenated on the
    feature axis, head-major within each. rope_cos/rope_sin: (T, D) fp32
    half-split tables (rope applied in-kernel to q and k; v passes
    through). kv_len masks keys >= kv_len. Returns (B, T, H*D) packed
    attention output, bit-identical to
    _flash_packed(*_rope_qkv_flat(qkv, ...)) — same fp32 rope math, same
    per-head MXU dots, same exp2 one-pass softmax.

    Constraints: 128 % D == 0 (head groups of hb = 128//D are one 128-lane
    column block), H % hb == 0, T % block_q == 0, full-kv single pass
    (T <= ~4096 so the fp32 score row fits VMEM)."""
    b, t, n3 = qkv.shape
    d = rope_cos.shape[-1]
    hb = 128 // d
    h = heads
    # real errors, not asserts: a violating caller would otherwise read
    # wrong qkv columns through the BlockSpec index maps under python -O
    if n3 != 3 * h * d:
        raise ValueError(f"qkv feature dim {n3} != 3*heads*d "
                         f"({heads}x{d}); shape {qkv.shape}")
    if 128 % d or h % hb:
        raise ValueError(f"need 128 % d == 0 and heads % (128//d) == 0; "
                         f"got d={d}, heads={h}")
    nh = h // hb                                        # 128-lane blocks
    if kv_len is None:
        kv_len = jnp.int32(t)
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(-1)
    bias = jnp.where(jnp.arange(t)[None, :] < kv_len[:, None], -30.0,
                     NEG_INF).astype(jnp.float32)[:, None, :]
    bias = jnp.broadcast_to(bias, (b, 1, t))

    reps = 128 // d
    cos2 = jnp.tile(rope_cos.astype(jnp.float32), (1, reps))   # (T, 128)
    sin2 = jnp.tile(rope_sin.astype(jnp.float32), (1, reps))

    if not block_q:
        block_q = 128
        # VMEM budget counts the double-buffered input/output blocks AND
        # the kernel's fp32 temporaries: the (t,128) roped-k scratch +
        # its fp32 rope temp at iq==0, and the per-block q rope
        # temp/table tiles (ADVICE r4: these were uncounted and could
        # push past VMEM at large auto-picked block_q)
        kv_bytes = 5 * t * 128 * qkv.dtype.itemsize + 3 * t * 128 * 4
        for cand in range(min(t, 1024), 127, -8):
            need = cand * t * 4 + 2 * cand * 128 * 4 + kv_bytes
            if t % cand == 0 and need <= 14 << 20:
                block_q = cand
                break
    if t % block_q:
        raise ValueError(f"seq {t} must divide block_q {block_q}")

    if kv_split < 1 or (kv_split > 1 and t // 128 < kv_split):
        raise ValueError(f"kv_split {kv_split} needs 1..{max(1, t // 128)} "
                         f"(128-lane chunks of seq {t})")
    grid = (b, nh, t // block_q)
    kernel = functools.partial(_kernel_flat, scale=scale, d=d,
                               kv_split=kv_split)
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
        scratch_shapes=[
            pltpu.VMEM((t, 128), qkv.dtype),            # roped k
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, cos2, sin2, cos2, sin2, bias)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_kv",
                                    "head_block", "packed_out"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    kv_len: jax.Array | None = None, scale: float = 1.0,
                    block_q: int = 256, block_kv: int = 256,
                    head_block: int = 1,
                    packed_out: bool = False) -> jax.Array:
    """q, k, v: (B, H, S, D) -> (B, H, S, D). Non-causal; keys at positions
    >= kv_len are masked out (kv_len defaults to S). When block_kv covers
    the whole sequence a single-pass kernel (no online-softmax scratch) is
    used, with `head_block` heads batched per grid program. packed_out
    (single-pass path only) returns (B, S, H*D) with the head relayout done
    per-tile in VMEM."""
    b, h, s, d = q.shape
    block_q = min(block_q, s)
    block_kv = min(block_kv, s)
    if s % block_q or s % block_kv:
        raise ValueError(f"seq {s} must divide block sizes "
                         f"({block_q}, {block_kv})")
    if kv_len is None:
        kv_len = jnp.int32(s)

    if block_kv == s and head_block and h % head_block == 0:
        # kv_len may be a scalar or a (B,) per-request vector here
        return _flash_onepass(q, k, v, kv_len, scale, block_q, head_block,
                              packed_out)
    if packed_out:
        raise NotImplementedError("packed_out needs the single-pass kernel")
    # head_block=0 forces the scratch-carry kernel even at block_kv == s
    if jnp.asarray(kv_len).ndim > 0 and jnp.asarray(kv_len).size != 1:
        raise NotImplementedError(
            "per-request (B,) kv_len vectors are only supported on the "
            "single-pass full-kv kernel (block_kv == seq); the two-pass "
            "scratch kernel masks with a shared scalar")
    kv_len = jnp.asarray(kv_len, jnp.int32).reshape(1)   # scalar-only path

    grid = (b, h, s // block_q, s // block_kv)
    kernel = functools.partial(_kernel, bkv=block_kv, scale=scale)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, d),
                             lambda ib, ih, iq, ikv, kvlen: (ib, ih, iq, 0)),
                pl.BlockSpec((1, 1, block_kv, d),
                             lambda ib, ih, iq, ikv, kvlen: (ib, ih, ikv, 0)),
                pl.BlockSpec((1, 1, block_kv, d),
                             lambda ib, ih, iq, ikv, kvlen: (ib, ih, ikv, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, d),
                                   lambda ib, ih, iq, ikv, kvlen: (ib, ih, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),   # running max
                pltpu.VMEM((block_q, 1), jnp.float32),   # running denom
                pltpu.VMEM((block_q, d), jnp.float32),   # output accum
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
    )(kv_len, q, k, v)
