"""Pallas fused decode-layer tail: attn-out projection -> residual ->
RMSNorm -> SwiGLU MLP -> residual, one kernel, for M=1..8 AR decode rows.

Status: a MEASURED NET LOSS at the Qwen3-TTS 0.6B talker shapes and
therefore opt-in (qwen3_stack_step fused="mlp"/"all"), kept as tested
infrastructure like ops/quant_matmul.py. Int8 28-layer talker step:
1.56 ms unfused -> 1.89 ms with this kernel (benchmarks/qwen_profile.py
talker_fmlp). Root cause: the kernel must cast the 11 MB/layer of s8
weight blocks to bf16 on the VPU before each dot, and that cast chain
rate-limits below XLA's convert-in-matvec matvec (~680 GB/s effective).
The companion qkv-head kernel (ops/decode_qkv.py) with 4 MB/layer IS a
win — its XLA counterpart carries more small-op overhead (norms, rope,
reshapes) per byte streamed. Revisit only with an int8-MXU (W8A8)
variant that skips the cast — that changes outputs, so it must stay
opt-in (see ops/dit_mlp._kernel_q8 for the pattern).

Replaces (see models/qwen_tts.qwen3_stack_step, the behavioral contract
from /root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py:907-1072):

    x  = x + dense(att, wo)
    h  = rms_norm(x, eps)
    g, u = split(dense(h, w_gate_up))
    y  = x + dense(silu(g) * u, w_down)

Numerics replicate the XLA chain: every dense is an fp32-accumulate dot
rounded to the activation dtype, then (int8 path) scaled by the bf16-cast
per-channel scale — the same order as quant.weight_only.dense. The fp32
rms uses the same eps placement as nn.norm.rms_norm. Partial f32 block
accumulation reassociates the K-reduction; parity-tested to ~1 bf16 ulp
in tests/test_decode_kernels.py.

Grid: one 1-D grid of (nb_o + nb_f) steps. Steps [0, nb_o) stream wo in
row blocks and accumulate the out-projection; the boundary step forms the
residual + rms in VMEM scratch; steps [nb_o, nb_o+nb_f) stream
gate/up/down column blocks, accumulating the down matvec. Activations
never leave VMEM; each weight byte is read exactly once (the parked
operands' index maps hold their block constant, so the revisit rule skips
refetches).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..quant.weight_only import QTensor

__all__ = ["fused_out_mlp", "fused_out_mlp_q8", "out_mlp_reference"]


def _pick_block(dim: int, target: int = 512, mult: int = 128) -> int:
    """Largest divisor of `dim` that is a multiple of `mult` and <= target;
    falls back to the smallest multiple-of-mult divisor (or dim itself)."""
    best = None
    for b in range(mult, dim + 1, mult):
        if dim % b == 0:
            if b <= target:
                best = b
            elif best is None:
                best = b
                break
    return best if best is not None else dim


def _dot(a, w, sc):
    """fp32-accumulate dot rounded to a.dtype, then per-channel scale in
    a.dtype — bit-matching quant.weight_only.dense (int8) / jnp.matmul."""
    y = jax.lax.dot_general(
        a, w.astype(a.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(a.dtype)
    if sc is not None:
        # keep the scale 2-D (1, N): Mosaic rejects broadcasts of casted
        # 1-D vectors ('vector.broadcast' element type verification)
        y = y * sc[...].astype(a.dtype)
    return y


def _kernel(x_ref, att_ref, wo_ref, wg_ref, wu_ref, wd_ref,
            so_ref, sg_ref, su_ref, sd_ref, o_ref, acc_ref, x2_ref, h2_ref,
            *, nb_o, nb_f, eps):
    j = pl.program_id(0)
    quant = so_ref is not None

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j < nb_o)
    def _():
        att = att_ref[...]                                # (B, Ab)
        acc_ref[...] += jax.lax.dot_general(
            att, wo_ref[...].astype(att.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nb_o - 1)
    def _():
        x = x_ref[...]
        y = acc_ref[...].astype(x.dtype)
        if quant:
            y = y * so_ref[...].astype(x.dtype)
        x2 = x + y
        x2_ref[...] = x2
        # rms ONCE here, not per phase-2 step: the cross-lane mean is a
        # slow VPU reduction — recomputing it per block measured +0.5 ms
        # on the 28-layer talker step
        xf = x2.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        h2_ref[...] = (xf * jax.lax.rsqrt(var + eps)).astype(x2.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j >= nb_o)
    def _():
        h2 = h2_ref[...]
        g = _dot(h2, wg_ref[...], sg_ref if quant else None)
        u = _dot(h2, wu_ref[...], su_ref if quant else None)
        # silu in fp32: Mosaic mis-lowers bf16 logistic (broadcasts the
        # f32 1.0 into a bf16 vector and fails verification); one extra
        # rounding vs the XLA bf16 silu — ~1 bf16 ulp, parity-tested
        a = (jax.nn.silu(g.astype(jnp.float32))
             * u.astype(jnp.float32)).astype(g.dtype)     # (B, Fb)
        acc_ref[...] += jax.lax.dot_general(
            a, wd_ref[...].astype(a.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == nb_o + nb_f - 1)
    def _():
        x2 = x2_ref[...]
        y = acc_ref[...].astype(x2.dtype)
        if quant:
            y = y * sd_ref[...].astype(x2.dtype)
        o_ref[...] = x2 + y


def fused_out_mlp(x: jax.Array, att: jax.Array, wo, w_gate_up, w_down,
                  *, eps: float = 1e-6, interpret: bool = False) -> jax.Array:
    """x (B, H) residual input; att (B, A) attention output rows.
    wo (A, H), w_gate_up (H, 2F), w_down (F, H) — all three plain arrays
    or all three int8 QTensors (the quantize_pytree policy quantizes them
    together). Returns (B, H) in x.dtype."""
    b, hd = x.shape
    a_dim = att.shape[1]
    quant = isinstance(wo, QTensor)
    if quant != isinstance(w_gate_up, QTensor) or \
            quant != isinstance(w_down, QTensor):
        raise ValueError("wo/w_gate_up/w_down must be uniformly quantized")

    wo_w = wo.q if quant else wo
    wgu_w = w_gate_up.q if quant else w_gate_up
    wd_w = w_down.q if quant else w_down
    f_dim = wd_w.shape[0]
    if wgu_w.shape != (hd, 2 * f_dim) or wo_w.shape != (a_dim, hd) \
            or wd_w.shape != (f_dim, hd):
        raise ValueError(
            f"shape mismatch: wo {wo_w.shape}, gate_up {wgu_w.shape}, "
            f"down {wd_w.shape} for x {x.shape}, att {att.shape}")

    ab = _pick_block(a_dim)
    fb = _pick_block(f_dim)
    nb_o, nb_f = a_dim // ab, f_dim // fb
    n = nb_o + nb_f

    wg_w, wu_w = wgu_w[:, :f_dim], wgu_w[:, f_dim:]
    if quant:
        so = wo.scale.reshape(1, hd)
        sg = w_gate_up.scale[:f_dim].reshape(1, f_dim)
        su = w_gate_up.scale[f_dim:].reshape(1, f_dim)
        sd = w_down.scale.reshape(1, hd)
    else:
        so = sg = su = sd = None

    # Parked operands keep their index constant so the revisit rule skips
    # refetches; gate/up/down park at block 0 during phase 1 and are
    # prefetched there, wo parks at its last block during phase 2.
    specs = [
        pl.BlockSpec((b, hd), lambda j: (0, 0)),                     # x
        pl.BlockSpec((b, ab), lambda j: (0, jnp.minimum(j, nb_o - 1))),
        pl.BlockSpec((ab, hd), lambda j: (jnp.minimum(j, nb_o - 1), 0)),
        pl.BlockSpec((hd, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
        pl.BlockSpec((hd, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
        pl.BlockSpec((fb, hd), lambda j: (jnp.maximum(j - nb_o, 0), 0)),
    ]
    args = [x, att, wo_w, wg_w, wu_w, wd_w]
    if quant:
        specs += [
            pl.BlockSpec((1, hd), lambda j: (0, 0)),                 # so
            pl.BlockSpec((1, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
            pl.BlockSpec((1, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
            pl.BlockSpec((1, hd), lambda j: (0, 0)),                 # sd
        ]
        args += [so, sg, su, sd]
        kern = functools.partial(_kernel, nb_o=nb_o, nb_f=nb_f, eps=eps)
    else:
        kern = functools.partial(
            _no_scale_kernel, nb_o=nb_o, nb_f=nb_f, eps=eps)

    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=specs,
        out_specs=pl.BlockSpec((b, hd), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, hd), jnp.float32),     # acc
            pltpu.VMEM((b, hd), x.dtype),         # x2
            pltpu.VMEM((b, hd), x.dtype),         # h2 (post-rms)
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)


def _no_scale_kernel(x_ref, att_ref, wo_ref, wg_ref, wu_ref, wd_ref,
                     o_ref, acc_ref, x2_ref, h2_ref, *, nb_o, nb_f, eps):
    _kernel(x_ref, att_ref, wo_ref, wg_ref, wu_ref, wd_ref,
            None, None, None, None, o_ref, acc_ref, x2_ref, h2_ref,
            nb_o=nb_o, nb_f=nb_f, eps=eps)


def _kernel_q8(x_ref, attq_ref, ats_ref, wo_ref, wg_ref, wu_ref, wd_ref,
               so_ref, sg_ref, su_ref, sd_ref, o_ref,
               acc_ref, accf_ref, x2_ref, h2q_ref, hs_ref,
               *, nb_o, nb_f, eps):
    """W8A8 tail: weights stay s8 in VMEM and every dot runs s8 x s8
    with int32 accumulation — no per-block s8->bf16 weight casts.
    Activations quantize per row (att on the XLA side — the row spans
    blocks; h2 in-kernel at the boundary; the silu product per F-block).
    Output-changing (the reference's ORT dynamic-quant Q8 analog), so
    opt-in via fused="mlp_q8".

    Status: ALSO a measured net loss at M=1 (Qwen talker step 1.24 ms
    with the fused qkv head alone -> 1.68 ms adding this tail) — so the
    weight-cast theory does not explain the whole weight-only-kernel
    gap; at single-row occupancy the s8 dots apparently lower to
    VPU-integer multiply-reduce, which is slower than XLA's
    convert-in-matvec fp chain. The decode MLP tail stays on XLA; this
    kernel remains a tested lever for batched (M >= 8) serving where the
    int8 MXU path engages."""
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        accf_ref[...] = jnp.zeros_like(accf_ref)

    @pl.when(j < nb_o)
    def _():
        acc_ref[...] += jax.lax.dot_general(
            attq_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)

    @pl.when(j == nb_o - 1)
    def _():
        x = x_ref[...]
        y = acc_ref[...].astype(jnp.float32) * ats_ref[..., :1] \
            * so_ref[...]
        x2 = x + y.astype(x.dtype)
        x2_ref[...] = x2
        xf = x2.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        n = xf * jax.lax.rsqrt(var + eps)
        amax = jnp.max(jnp.abs(n), axis=-1, keepdims=True)
        hs = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        h2q_ref[...] = jnp.clip(jnp.round(n / hs), -127, 127
                                ).astype(jnp.int8)
        hs_ref[...] = jnp.broadcast_to(hs, hs_ref.shape)

    @pl.when(j >= nb_o)
    def _():
        h2q = h2q_ref[...]
        hs = hs_ref[..., :1]
        g = jax.lax.dot_general(
            h2q, wg_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * hs * sg_ref[...]
        u = jax.lax.dot_general(
            h2q, wu_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * hs * su_ref[...]
        a = jax.nn.silu(g) * u                          # (B, Fb) fp32
        amax = jnp.max(jnp.abs(a), axis=-1, keepdims=True)
        as_ = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)
        aq = jnp.clip(jnp.round(a / as_), -127, 127).astype(jnp.int8)
        accf_ref[...] += jax.lax.dot_general(
            aq, wd_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * as_

    @pl.when(j == nb_o + nb_f - 1)
    def _():
        x2 = x2_ref[...]
        o_ref[...] = x2 + (accf_ref[...] * sd_ref[...]).astype(x2.dtype)


def fused_out_mlp_q8(x: jax.Array, att: jax.Array, wo, w_gate_up, w_down,
                     *, eps: float = 1e-6, interpret: bool = False
                     ) -> jax.Array:
    """W8A8 decode tail (see _kernel_q8). All three weights must be int8
    QTensors. att is quantized per row here (XLA fuses the amax/scale into
    the producing ops)."""
    b, hd = x.shape
    a_dim = att.shape[1]
    if not (isinstance(wo, QTensor) and isinstance(w_gate_up, QTensor)
            and isinstance(w_down, QTensor)):
        raise ValueError("fused_out_mlp_q8 needs int8 QTensor weights")
    f_dim = w_down.q.shape[0]
    ab = _pick_block(a_dim)
    fb = _pick_block(f_dim)
    nb_o, nb_f = a_dim // ab, f_dim // fb

    af = att.astype(jnp.float32)
    amax = jnp.max(jnp.abs(af), axis=-1, keepdims=True)
    ats = jnp.maximum(amax, 1e-8) * (1.0 / 127.0)       # (B, 1)
    attq = jnp.clip(jnp.round(af / ats), -127, 127).astype(jnp.int8)
    ats = jnp.broadcast_to(ats, (b, 128))

    wg_w, wu_w = w_gate_up.q[:, :f_dim], w_gate_up.q[:, f_dim:]
    specs = [
        pl.BlockSpec((b, hd), lambda j: (0, 0)),                  # x
        pl.BlockSpec((b, ab), lambda j: (0, jnp.minimum(j, nb_o - 1))),
        pl.BlockSpec((b, 128), lambda j: (0, 0)),                 # ats
        pl.BlockSpec((ab, hd), lambda j: (jnp.minimum(j, nb_o - 1), 0)),
        pl.BlockSpec((hd, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
        pl.BlockSpec((hd, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
        pl.BlockSpec((fb, hd), lambda j: (jnp.maximum(j - nb_o, 0), 0)),
        pl.BlockSpec((1, hd), lambda j: (0, 0)),                  # so
        pl.BlockSpec((1, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
        pl.BlockSpec((1, fb), lambda j: (0, jnp.maximum(j - nb_o, 0))),
        pl.BlockSpec((1, hd), lambda j: (0, 0)),                  # sd
    ]
    args = [x, attq, ats, wo.q, wg_w, wu_w, w_down.q,
            wo.scale.reshape(1, hd),
            w_gate_up.scale[:f_dim].reshape(1, f_dim),
            w_gate_up.scale[f_dim:].reshape(1, f_dim),
            w_down.scale.reshape(1, hd)]

    return pl.pallas_call(
        functools.partial(_kernel_q8, nb_o=nb_o, nb_f=nb_f, eps=eps),
        grid=(nb_o + nb_f,),
        in_specs=specs,
        out_specs=pl.BlockSpec((b, hd), lambda j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((b, hd), jnp.int32),       # int32 out-proj accum
            pltpu.VMEM((b, hd), jnp.float32),     # fp32 down accum
            pltpu.VMEM((b, hd), x.dtype),         # x2
            pltpu.VMEM((b, hd), jnp.int8),        # quantized h2
            pltpu.VMEM((b, 128), jnp.float32),    # h2 row scale
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)


def out_mlp_reference(x, att, wo, w_gate_up, w_down, *, eps=1e-6):
    """The exact XLA chain this kernel replaces (for parity tests)."""
    from ..nn.norm import rms_norm
    from ..quant.weight_only import dense

    x = x + dense(att, wo)
    h = rms_norm(x, eps=eps)
    gu = dense(h, w_gate_up)
    gate, up = jnp.split(gu, 2, axis=-1)
    return x + dense(jax.nn.silu(gate) * up, w_down)
