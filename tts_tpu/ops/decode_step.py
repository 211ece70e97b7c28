"""Pallas fused decode step head: RMSNorm -> fused-QKV matvec -> per-head
q/k RMSNorm -> RoPE -> GQA attention over the KV cache, one kernel, for
the M=1 AR decode row.

Extends the proven-win qkv head (ops/decode_qkv.py, int8 Qwen talker step
1.56 -> 1.27 ms) by also absorbing the attention contraction that
currently runs in XLA: per layer that removes the mask build, the
score/softmax/PV op chain and its reshapes — the distributed small-op
overhead NOTES.md pins at ~10 us per layer-step across the ~92
layer-steps of a Qwen frame. The MLP tail deliberately stays on XLA:
both fused-tail variants measured net losses (ops/decode_mlp.py header —
the s8->bf16 weight casts rate-limit below XLA's convert-in-matvec
matvec), while the attention reads here are bf16 cache rows with no cast
penalty.

Design (contract from models/qwen_tts.qwen3_stack_step, reference
/root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py:907-1072):

  * grid (nb,) streams wqkv column blocks exactly like decode_qkv; the
    whole layer's k/v cache rides along as PARKED blocks (constant index
    map -> fetched once), sliced out of the STACKED (L, B, KVH, T, D)
    cache by block index — no XLA gather/copy of the layer.
  * the final step runs the epilogue: scale/bias, per-head norms, rope,
    then attention. The step's own k/v row is handled as a separate
    in-register track (scores s_new, PV term p_new * v_new) — exactly
    what the XLA path computes after its dynamic_update_slice appended
    row `pos`, so the caller's DUS can stay outside (and after) the
    kernel unchanged.
  * masking matches nn/attention.gqa_attention: fp32 scores, rows
    >= pos forced to -1e30, one-shot fp32 softmax (max/exp/sum — not the
    flash online form), probabilities cast to the activation dtype
    before the PV contraction. The cache-block PV accumulates fp32 and
    rounds once, like XLA's single dot; reassociation vs the fused
    new-row term is ~1 fp32 ulp (parity-tested).

Gating: M=1, head_dim == 128 (the Qwen talker/predictor geometry; the
hd=64 packed layouts would need a packed attention epilogue), no
per-row kv validity masks, causal. Callers fall back to
fused_qkv_rope + XLA attention otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.weight_only import QTensor
from .decode_mlp import _pick_block
from .decode_qkv import _norm_rope, _rope_only

__all__ = ["fused_qkv_attn", "qkv_attn_reference"]

NEG_INF = -1e30


def _kernel(pos_ref, x_ref, w_ref, kc_ref, vc_ref, sc_ref, b_ref, qn_ref,
            kn_ref, cos_ref, sin_ref, lnw_ref, lnb_ref, attn_ref, k_ref,
            v_ref, acc_ref, h_ref, *, nb, heads, kv_heads, head_dim, eps,
            norm):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        x = x_ref[...]
        xf = x.astype(jnp.float32)
        if norm == "ln":
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            out = (xf - mean) * jax.lax.rsqrt(var + eps)
            out = out * lnw_ref[...].astype(jnp.float32) \
                + lnb_ref[...].astype(jnp.float32)
        else:
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            out = xf * jax.lax.rsqrt(var + eps)
        h_ref[...] = out.astype(x.dtype)

    h = h_ref[...]
    acc = jax.lax.dot_general(
        h, w_ref[...].astype(h.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    idx = pl.ds(j * acc.shape[1], acc.shape[1])
    acc_ref[:, idx] = acc

    @pl.when(j == nb - 1)
    def _():
        x = x_ref[...]
        dt = x.dtype
        qkv = acc_ref[...].astype(dt)
        if sc_ref is not None:
            qkv = qkv * sc_ref[...].astype(dt)
        if b_ref is not None:
            qkv = qkv + b_ref[...]
        q_sz = heads * head_dim
        kv_sz = kv_heads * head_dim
        q = qkv[:, :q_sz]
        k = qkv[:, q_sz:q_sz + kv_sz]
        v = qkv[:, q_sz + kv_sz:]
        if cos_ref is None:                    # no rope (IndexTTS GPT-2)
            pass
        elif qn_ref is not None:
            q = _norm_rope(q, qn_ref, cos_ref, sin_ref, heads, head_dim, eps)
            k = _norm_rope(k, kn_ref, cos_ref, sin_ref, kv_heads, head_dim,
                           eps)
        else:
            q = _rope_only(q, cos_ref, sin_ref, heads, head_dim)
            k = _rope_only(k, cos_ref, sin_ref, kv_heads, head_dim)
        k_ref[...] = k
        v_ref[...] = v

        # ---- attention (B=1): heads are kvh-major like gqa_attention
        g = heads // kv_heads
        pos = pos_ref[0]
        if head_dim >= 128:
            qh = q.reshape(heads, head_dim).reshape(kv_heads, g, head_dim)
            kn = k.reshape(kv_heads, 1, head_dim)
            vn = v.reshape(kv_heads, 1, head_dim)
            kc = kc_ref[...]                           # (KVH, T, D)
            vc = vc_ref[...]
            s = jax.lax.dot_general(
                qh, kc, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (KVH, G, T)
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
            s = jnp.where(kv_idx < pos, s, NEG_INF)
            s_new = jax.lax.dot_general(
                qh, kn, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (KVH, G, 1)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
            p = jnp.exp(s - m)
            p_new = jnp.exp(s_new - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
            probs = (p / denom).astype(dt)
            probs_new = (p_new / denom).astype(dt)
            pv = jax.lax.dot_general(
                probs, vc, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)    # (KVH, G, D)
            pv = pv + probs_new.astype(jnp.float32) * vn.astype(jnp.float32)
            attn_ref[...] = pv.astype(dt).reshape(1, q_sz)
        else:
            # hd=64 packed path, pure 2-D. Mosaic rules learned on-chip:
            # 3-D stacks / (rows,128)->(2rows,64) casts of 64-lane tiles
            # are "unsupported shape cast"s, and sublane-concat of
            # lane-sliced pieces at DIFFERENT lane offsets is an "offset
            # mismatch on non-concat dimension". The legal normalizer is
            # the _rot_half trick: a 2-piece LANE concat is a rotation
            # producing an offset-0 tile, after which sublane concats
            # and dots are unconstrained. Output leaves as (H, D); the
            # wrapper reshapes to the flat row in XLA where the cast is
            # free.
            d = head_dim
            hpr = 128 // d
            qm = q.reshape(heads // hpr, 128)
            km = k.reshape(kv_heads // hpr, 128)   # wrapper guarantees
            vm = v.reshape(kv_heads // hpr, 128)   # kv_sz % 128 == 0

            def head_row(mat, h):
                """(1, d) lane-offset-0 row for head h from the packed
                (rows, 128) tile."""
                piece = mat[h // hpr:h // hpr + 1]             # (1, 128)
                off = (h % hpr) * d
                if off:
                    piece = jnp.concatenate(
                        [piece[:, off:], piece[:, :off]], axis=-1)
                return piece[:, :d]

            def unpack(mat, n):
                return jnp.concatenate(
                    [head_row(mat, h) for h in range(n)], axis=0)

            qh2 = unpack(qm, heads)                            # (H, d)
            kn2 = unpack(km, kv_heads).astype(jnp.float32)     # (KVH, d)
            vn2 = unpack(vm, kv_heads).astype(jnp.float32)
            s_parts, sn_parts = [], []
            for kv_j in range(kv_heads):
                q_j = qh2[kv_j * g:(kv_j + 1) * g]             # (G, d)
                s_parts.append(jax.lax.dot_general(
                    q_j, kc_ref[kv_j], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32))       # (G, T)
                sn_parts.append(jnp.sum(
                    q_j.astype(jnp.float32) * kn2[kv_j:kv_j + 1],
                    axis=-1, keepdims=True))                   # (G, 1)
            s = jnp.concatenate(s_parts, axis=0)               # (H, T)
            s_new = jnp.concatenate(sn_parts, axis=0)          # (H, 1)
            kv_idx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kv_idx < pos, s, NEG_INF)
            m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), s_new)
            p = jnp.exp(s - m)
            p_new = jnp.exp(s_new - m)
            denom = jnp.sum(p, axis=-1, keepdims=True) + p_new
            probs = (p / denom).astype(dt)
            probs_new = p_new / denom                          # (H, 1) f32
            outs = []
            for kv_j in range(kv_heads):
                pv_j = jax.lax.dot_general(
                    probs[kv_j * g:(kv_j + 1) * g], vc_ref[kv_j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # (G, d)
                pv_j = pv_j + probs_new[kv_j * g:(kv_j + 1) * g] \
                    * vn2[kv_j:kv_j + 1]
                outs.append(pv_j.astype(dt))
            attn_ref[...] = jnp.concatenate(outs, axis=0)      # (H, d)


def fused_qkv_attn(x: jax.Array, wqkv, rope_cos=None, rope_sin=None,
                   k_cache: jax.Array = None, v_cache: jax.Array = None,
                   layer: int = 0, pos=None, *, heads: int, kv_heads: int,
                   head_dim: int, q_norm: jax.Array | None = None,
                   k_norm: jax.Array | None = None,
                   bqkv: jax.Array | None = None,
                   norm: str = "rms",
                   ln_weight: jax.Array | None = None,
                   ln_bias: jax.Array | None = None,
                   eps: float = 1e-6, interpret: bool = False):
    """x (1, H); wqkv (H, (heads+2*kvh)*hd) plain or int8 QTensor;
    rope_cos/rope_sin (1, hd) rows for the current position (None = no
    rope — the IndexTTS GPT-2 layout); k_cache/v_cache the STACKED
    (L, 1, KVH, T, D) buffers (read-only — the caller's
    dynamic_update_slice append stays outside); layer a static int; pos
    the traced int32 length (cache rows < pos valid). norm="ln" uses
    LayerNorm with ln_weight/ln_bias (GPT-2 ln_1) instead of the
    weightless RMSNorm.

    Returns (attn (1, heads*hd), k_row (1, kvh*hd), v_row (1, kvh*hd)):
    attention output over cache[:pos] + the step's own roped k/v row,
    plus the k/v rows for the caller's cache append."""
    b, hd_in = x.shape
    if b != 1:
        raise ValueError("fused_qkv_attn is the M=1 decode head")
    if head_dim not in (64, 128):
        raise ValueError("fused_qkv_attn requires head_dim in (64, 128)")
    if (heads * head_dim) % 128 or (kv_heads * head_dim) % 128:
        raise ValueError("q/kv row widths must pack into 128 lanes")
    num_layers, cb_, kvh_, t, d_ = k_cache.shape
    if cb_ != 1 or kvh_ != kv_heads or d_ != head_dim:
        raise ValueError(
            f"cache shape {k_cache.shape} != (L, 1, {kv_heads}, T, "
            f"{head_dim})")
    quant = isinstance(wqkv, QTensor)
    w = wqkv.q if quant else wqkv
    qkv_out = w.shape[1]
    if qkv_out != (heads + 2 * kv_heads) * head_dim:
        raise ValueError(f"wqkv out {qkv_out} != heads/kv split")
    cb = _pick_block(qkv_out)
    nb = qkv_out // cb
    q_sz, kv_sz = heads * head_dim, kv_heads * head_dim

    # 3-D bitcast views of the stacked caches: (L*KVH, T, D) with the
    # layer's rows selected purely by block index — no gather, no copy
    kc3 = k_cache.reshape(num_layers * kv_heads, t, head_dim)
    vc3 = v_cache.reshape(num_layers * kv_heads, t, head_dim)

    specs = [
        pl.BlockSpec((b, hd_in), lambda j, p: (0, 0)),         # x
        pl.BlockSpec((hd_in, cb), lambda j, p: (0, j)),        # wqkv block
        pl.BlockSpec((kv_heads, t, head_dim),
                     lambda j, p, _l=layer: (_l, 0, 0)),       # k cache
        pl.BlockSpec((kv_heads, t, head_dim),
                     lambda j, p, _l=layer: (_l, 0, 0)),       # v cache
    ]
    args = [x, w, kc3, vc3]
    nones = []
    if quant:
        specs.append(pl.BlockSpec((1, qkv_out), lambda j, p: (0, 0)))
        args.append(wqkv.scale.reshape(1, qkv_out))
    else:
        nones.append("sc_ref")
    if bqkv is not None:
        specs.append(pl.BlockSpec((1, qkv_out), lambda j, p: (0, 0)))
        args.append(bqkv.reshape(1, qkv_out))
    else:
        nones.append("b_ref")
    if q_norm is not None:
        specs += [pl.BlockSpec((1, head_dim), lambda j, p: (0, 0))] * 2
        args += [q_norm.reshape(1, head_dim), k_norm.reshape(1, head_dim)]
    else:
        nones += ["qn_ref", "kn_ref"]
    if rope_cos is not None:
        specs += [pl.BlockSpec((1, head_dim), lambda j, p: (0, 0))] * 2
        args += [rope_cos.reshape(1, head_dim),
                 rope_sin.reshape(1, head_dim)]
    else:
        nones += ["cos_ref", "sin_ref"]
    if norm == "ln":
        specs += [pl.BlockSpec((1, hd_in), lambda j, p: (0, 0))] * 2
        args += [ln_weight.reshape(1, hd_in), ln_bias.reshape(1, hd_in)]
    else:
        nones += ["lnw_ref", "lnb_ref"]

    kern = functools.partial(
        _dispatch, present=tuple(nones), nb=nb, heads=heads,
        kv_heads=kv_heads, head_dim=head_dim, eps=eps, norm=norm)

    pos = jnp.asarray(pos, jnp.int32).reshape(1)
    # hd<128: the kernel emits attention as (H, D) per-head rows (Mosaic
    # cannot repack them into the flat 128-lane row in VMEM — offset
    # rules, see the kernel comment); the flat reshape happens here in
    # XLA where it is free
    attn_shape = (b, q_sz) if head_dim >= 128 else (heads, head_dim)
    attn, k_row, v_row = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=specs,
            out_specs=[
                pl.BlockSpec(attn_shape, lambda j, p: (0, 0)),
                pl.BlockSpec((b, kv_sz), lambda j, p: (0, 0)),
                pl.BlockSpec((b, kv_sz), lambda j, p: (0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((b, qkv_out), jnp.float32),   # qkv accumulator
                pltpu.VMEM((b, hd_in), x.dtype),         # normed input
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(attn_shape, x.dtype),
            jax.ShapeDtypeStruct((b, kv_sz), x.dtype),
            jax.ShapeDtypeStruct((b, kv_sz), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(pos, *args)
    return attn.reshape(b, q_sz), k_row, v_row


def _dispatch(*refs, present, nb, heads, kv_heads, head_dim, eps, norm):
    refs = list(refs)
    pos_ref = refs.pop(0)
    x_ref = refs.pop(0)
    w_ref = refs.pop(0)
    kc_ref = refs.pop(0)
    vc_ref = refs.pop(0)
    sc_ref = None if "sc_ref" in present else refs.pop(0)
    b_ref = None if "b_ref" in present else refs.pop(0)
    qn_ref = None if "qn_ref" in present else refs.pop(0)
    kn_ref = None if "kn_ref" in present else refs.pop(0)
    cos_ref = None if "cos_ref" in present else refs.pop(0)
    sin_ref = None if "sin_ref" in present else refs.pop(0)
    lnw_ref = None if "lnw_ref" in present else refs.pop(0)
    lnb_ref = None if "lnb_ref" in present else refs.pop(0)
    attn_ref, k_ref, v_ref, acc_ref, h_ref = refs
    _kernel(pos_ref, x_ref, w_ref, kc_ref, vc_ref, sc_ref, b_ref, qn_ref,
            kn_ref, cos_ref, sin_ref, lnw_ref, lnb_ref, attn_ref, k_ref,
            v_ref, acc_ref, h_ref, nb=nb, heads=heads, kv_heads=kv_heads,
            head_dim=head_dim, eps=eps, norm=norm)


def qkv_attn_reference(x, wqkv, rope_cos, rope_sin, k_cache, v_cache,
                       layer, pos, *, heads, kv_heads, head_dim,
                       q_norm=None, k_norm=None, bqkv=None, norm="rms",
                       ln_weight=None, ln_bias=None, eps=1e-6):
    """The exact XLA chain this kernel replaces (for parity tests):
    qkv head -> DUS append at pos -> masked gqa_attention with
    kv_len = pos + 1."""
    from ..nn.attention import attention_mask, gqa_attention
    from .decode_qkv import qkv_rope_reference

    b = x.shape[0]
    q, k, v = qkv_rope_reference(
        x, wqkv, rope_cos, rope_sin, heads=heads, kv_heads=kv_heads,
        head_dim=head_dim, q_norm=q_norm, k_norm=k_norm, bqkv=bqkv,
        norm=norm, ln_weight=ln_weight, ln_bias=ln_bias, eps=eps)
    t = k_cache.shape[3]
    kf = jax.lax.dynamic_update_slice(
        k_cache, k.reshape(b, 1, kv_heads, head_dim).swapaxes(1, 2)[None]
        .astype(k_cache.dtype), (layer, 0, 0, pos, 0))[layer]
    vf = jax.lax.dynamic_update_slice(
        v_cache, v.reshape(b, 1, kv_heads, head_dim).swapaxes(1, 2)[None]
        .astype(v_cache.dtype), (layer, 0, 0, pos, 0))[layer]
    mask = attention_mask(1, t, pos, pos + 1)
    out = gqa_attention(q.reshape(b, 1, heads, head_dim), kf, vf, mask)
    return out.reshape(b, heads * head_dim), k, v
