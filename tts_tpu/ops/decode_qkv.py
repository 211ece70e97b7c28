"""Pallas fused decode-layer head: RMSNorm (or GPT-2 LayerNorm) ->
fused-QKV matvec -> per-head q/k RMSNorm -> RoPE, one kernel, for
M=1..8 AR decode rows. The ONE fused decode stage that measured a WIN
across the AR families (int8: Qwen talker step 1.56 -> 1.27 ms,
predictor frame 1.26 -> 1.12 ms; Kani 1097 -> 1128 tok/s e2e) — its
XLA counterpart pays ~6 small-op fusion boundaries (norm, matvec,
bias, per-head norms, rope, reshapes) per 4 MB of weights streamed.

Used by all four AR decode loops (each family's `fused_decode=None`
auto-enables on TPU): models/qwen_tts.qwen3_stack_step,
models/voxcpm.llama_stack_step, models/kani._attn_layer, and
models/indextts.gpt_step (norm="ln", no rope). The attention
contraction + in-place KV append stay in XLA (kv/cache.py).

Replaces the XLA chain (contract from
/root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py:907-1072):

    h = rms_norm(x, eps)
    qkv = dense(h, wqkv) (+ bqkv)
    q, k, v = split/reshape(qkv)
    q = rms_norm(q, q_norm); k = rms_norm(k, k_norm)   # optional
    q = rope(q); k = rope(k)                            # half-split

Numerics replicate the XLA ops in order (fp32-accumulate dot rounded to
the activation dtype, bf16-cast scales, fp32 norms, activation-dtype
rope), parity-tested in tests/test_decode_kernels.py.

Grid: 1-D over wqkv column blocks; the (B, QKV) accumulator lives in
fp32 VMEM scratch and the epilogue (norms + rope) runs on the last step.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.weight_only import QTensor, QTensor4, QTensorG
from .decode_mlp import _pick_block

__all__ = ["fused_qkv_rope", "fusable_weight", "fusable_layout",
           "qkv_rope_reference"]


def fusable_weight(w) -> bool:
    """int4 forms stay on the XLA dense() path: the kernel has no
    group-scale epilogue (QTensorG), and an in-kernel nibble unpack
    (QTensor4) would be cast-rate-bound at ~2x the ops of the s8 cast
    (NOTES.md); plain arrays and int8 QTensors fuse."""
    return not isinstance(w, (QTensor4, QTensorG))


def fusable_layout(batch: int, heads: int, kv_heads: int,
                   head_dim: int) -> bool:
    """Whether the (B, heads, head_dim) geometry packs into 128-lane rows
    (the kernel's epilogue constraint — fused_qkv_rope raises on layouts
    this returns False for). Models AND this into their auto-fuse gate so
    `fused_decode=None` degrades to the XLA path on small/tiny configs
    instead of erroring."""
    if head_dim >= 128:
        return True
    q_sz, kv_sz = heads * head_dim, kv_heads * head_dim
    return not (128 % head_dim or q_sz % 128 or kv_sz % 128
                or (batch * heads) % (128 // head_dim)
                or (batch * kv_heads) % (128 // head_dim))


def _norm_rope(seg, w, cos, sin, heads, head_dim, eps):
    """Per-head RMSNorm (optional weight ref) + half-split rope on a
    (B, heads*head_dim) segment.

    Mosaic only supports the (B, N) -> (rows, lanes) shape cast at lane
    width >= 128, so for head_dim < 128 the rows pack 128//head_dim heads
    each and the norm/rotate run per lane sub-segment (hd=64 packs two
    heads per 128-lane row — the KaniTTS/VoxCPM geometry)."""
    b = seg.shape[0]
    dt = seg.dtype
    width = max(head_dim, 128)
    hpr = width // head_dim                        # heads per row
    rows = b * heads // hpr
    hs = seg.reshape(rows, width)
    xf = hs.astype(jnp.float32)
    wf = None if w is None else w[...].astype(jnp.float32)
    half = head_dim // 2
    outs = []
    rots = []
    for i in range(hpr):
        s = xf[:, i * head_dim:(i + 1) * head_dim]
        var = jnp.mean(s * s, axis=-1, keepdims=True)
        o = s * jax.lax.rsqrt(var + eps)
        if wf is not None:
            o = o * wf
        o = o.astype(dt)
        outs.append(o)
        rots.append(jnp.concatenate([-o[:, half:], o[:, :half]], axis=-1))
    hs = jnp.concatenate(outs, axis=-1) if hpr > 1 else outs[0]
    rot = jnp.concatenate(rots, axis=-1) if hpr > 1 else rots[0]
    c = cos[...].astype(dt)
    s_ = sin[...].astype(dt)
    if hpr > 1:
        c = jnp.concatenate([c] * hpr, axis=-1)
        s_ = jnp.concatenate([s_] * hpr, axis=-1)
    hs = hs * c + rot * s_
    return hs.reshape(b, heads * head_dim)


def _rope_only(seg, cos, sin, heads, head_dim):
    b = seg.shape[0]
    dt = seg.dtype
    width = max(head_dim, 128)
    hpr = width // head_dim
    rows = b * heads // hpr
    hs = seg.reshape(rows, width)
    half = head_dim // 2
    rots = [jnp.concatenate(
        [-hs[:, i * head_dim + half:(i + 1) * head_dim],
         hs[:, i * head_dim:i * head_dim + half]], axis=-1)
        for i in range(hpr)]
    rot = jnp.concatenate(rots, axis=-1) if hpr > 1 else rots[0]
    c = cos[...].astype(dt)
    s_ = sin[...].astype(dt)
    if hpr > 1:
        c = jnp.concatenate([c] * hpr, axis=-1)
        s_ = jnp.concatenate([s_] * hpr, axis=-1)
    hs = hs * c + rot * s_
    return hs.reshape(b, heads * head_dim)


def _kernel(x_ref, w_ref, sc_ref, b_ref, qn_ref, kn_ref, cos_ref, sin_ref,
            lnw_ref, lnb_ref, q_ref, k_ref, v_ref, acc_ref, h_ref,
            *, nb, heads, kv_heads, head_dim, eps, norm):
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
        q_ref[...] = q
        k_ref[...] = k
        v_ref[...] = v


def fused_qkv_rope(x: jax.Array, wqkv, rope_cos=None, rope_sin=None, *,
                   heads: int, kv_heads: int, head_dim: int,
                   q_norm: jax.Array | None = None,
                   k_norm: jax.Array | None = None,
                   bqkv: jax.Array | None = None,
                   norm: str = "rms",
                   ln_weight: jax.Array | None = None,
                   ln_bias: jax.Array | None = None,
                   eps: float = 1e-6, interpret: bool = False):
    """x (B, H); wqkv (H, (heads+2*kv_heads)*head_dim) plain or QTensor;
    rope_cos/rope_sin (1, head_dim) rows for the current position (None =
    no rope — the IndexTTS GPT-2 layout with external learned positions);
    q_norm/k_norm optional per-head RMSNorm weights (scale pre-folded);
    norm="ln" uses LayerNorm with ln_weight/ln_bias instead of the
    weightless RMSNorm (GPT-2 ln_1).
    Returns (q (B, heads*hd), k (B, kvh*hd), v (B, kvh*hd)) roped/normed,
    flat per row — callers reshape to heads."""
    b, hd_in = x.shape
    quant = isinstance(wqkv, QTensor)
    w = wqkv.q if quant else wqkv
    qkv_out = w.shape[1]
    if qkv_out != (heads + 2 * kv_heads) * head_dim:
        raise ValueError(f"wqkv out {qkv_out} != heads/kv split")

    cb = _pick_block(qkv_out)
    nb = qkv_out // cb
    q_sz, kv_sz = heads * head_dim, kv_heads * head_dim
    if head_dim < 128 and (128 % head_dim or q_sz % 128 or kv_sz % 128
                           or (b * heads) % (128 // head_dim)
                           or (b * kv_heads) % (128 // head_dim)):
        # the epilogue packs 128//head_dim heads per 128-lane row (Mosaic
        # rejects lane widths < 128 in the (B, N) -> (rows, hd) cast)
        raise ValueError(
            f"head layout (heads={heads}, kv_heads={kv_heads}, "
            f"hd={head_dim}, B={b}) not packable into 128-lane rows")

    specs = [
        pl.BlockSpec((b, hd_in), lambda j: (0, 0)),      # x
        pl.BlockSpec((hd_in, cb), lambda j: (0, j)),     # wqkv block
    ]
    args = [x, w]
    nones = []
    if quant:
        specs.append(pl.BlockSpec((1, qkv_out), lambda j: (0, 0)))
        args.append(wqkv.scale.reshape(1, qkv_out))
    else:
        nones.append("sc_ref")
    if bqkv is not None:
        specs.append(pl.BlockSpec((1, qkv_out), lambda j: (0, 0)))
        args.append(bqkv.reshape(1, qkv_out))
    else:
        nones.append("b_ref")
    if q_norm is not None:
        specs += [pl.BlockSpec((1, head_dim), lambda j: (0, 0))] * 2
        args += [q_norm.reshape(1, head_dim), k_norm.reshape(1, head_dim)]
    else:
        nones += ["qn_ref", "kn_ref"]
    if rope_cos is not None:
        specs += [pl.BlockSpec((1, head_dim), lambda j: (0, 0))] * 2
        args += [rope_cos.reshape(1, head_dim),
                 rope_sin.reshape(1, head_dim)]
    else:
        nones += ["cos_ref", "sin_ref"]
    if norm == "ln":
        specs += [pl.BlockSpec((1, hd_in), lambda j: (0, 0))] * 2
        args += [ln_weight.reshape(1, hd_in), ln_bias.reshape(1, hd_in)]
    else:
        nones += ["lnw_ref", "lnb_ref"]

    kern = functools.partial(
        _dispatch_kernel, present=tuple(nones), nb=nb, heads=heads,
        kv_heads=kv_heads, head_dim=head_dim, eps=eps, norm=norm)

    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((b, q_sz), lambda j: (0, 0)),
            pl.BlockSpec((b, kv_sz), lambda j: (0, 0)),
            pl.BlockSpec((b, kv_sz), lambda j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, q_sz), x.dtype),
            jax.ShapeDtypeStruct((b, kv_sz), x.dtype),
            jax.ShapeDtypeStruct((b, kv_sz), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, qkv_out), jnp.float32),   # qkv accumulator
            pltpu.VMEM((b, hd_in), x.dtype),         # normed input
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)


def _dispatch_kernel(*refs, present, nb, heads, kv_heads, head_dim, eps,
                     norm):
    """Reinsert None placeholders for absent optional operands so _kernel
    sees a fixed signature (pallas passes only the real refs)."""
    refs = list(refs)
    x_ref = refs.pop(0)
    w_ref = refs.pop(0)
    sc_ref = None if "sc_ref" in present else refs.pop(0)
    b_ref = None if "b_ref" in present else refs.pop(0)
    qn_ref = None if "qn_ref" in present else refs.pop(0)
    kn_ref = None if "kn_ref" in present else refs.pop(0)
    cos_ref = None if "cos_ref" in present else refs.pop(0)
    sin_ref = None if "sin_ref" in present else refs.pop(0)
    lnw_ref = None if "lnw_ref" in present else refs.pop(0)
    lnb_ref = None if "lnb_ref" in present else refs.pop(0)
    q_ref, k_ref, v_ref, acc_ref, h_ref = refs
    _kernel(x_ref, w_ref, sc_ref, b_ref, qn_ref, kn_ref, cos_ref, sin_ref,
            lnw_ref, lnb_ref, q_ref, k_ref, v_ref, acc_ref, h_ref,
            nb=nb, heads=heads, kv_heads=kv_heads, head_dim=head_dim,
            eps=eps, norm=norm)


def qkv_rope_reference(x, wqkv, rope_cos=None, rope_sin=None, *, heads,
                       kv_heads, head_dim, q_norm=None, k_norm=None,
                       bqkv=None, norm="rms", ln_weight=None, ln_bias=None,
                       eps=1e-6):
    """The exact XLA chain this kernel replaces (for parity tests)."""
    from ..nn.norm import layer_norm, rms_norm
    from ..nn.rope import apply_rope
    from ..quant.weight_only import dense

    b = x.shape[0]
    if norm == "ln":
        h = layer_norm(x, ln_weight, ln_bias, eps=eps)
    else:
        h = rms_norm(x, eps=eps)
    qkv = dense(h, wqkv)
    if bqkv is not None:
        qkv = qkv + bqkv
    q_sz = heads * head_dim
    kv_sz = kv_heads * head_dim
    # (B, S=1, heads, hd) layout to match the stack-step call sites
    q = qkv[..., :q_sz].reshape(b, 1, heads, head_dim)
    k = qkv[..., q_sz:q_sz + kv_sz].reshape(b, 1, kv_heads, head_dim)
    v = qkv[..., q_sz + kv_sz:].reshape(b, 1, kv_heads, head_dim)
    if q_norm is not None:
        q = rms_norm(q, q_norm, eps=eps)
        k = rms_norm(k, k_norm, eps=eps)
    if rope_cos is not None:
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
    return (q.reshape(b, q_sz), k.reshape(b, kv_sz), v.reshape(b, kv_sz))
