"""Weight-only int8 quantization for matmul weights.

The reference ships INT8/INT4 weight-only variants of every AR family via
ONNX MatMulNBits (Kani_TTS/Optimize_ONNX.py:219-253,
Qwen_TTS/Optimize_ONNX.py:39-66: transformer weights int8/int4, codecs kept
float). The TPU-native equivalent: per-output-channel symmetric int8 with a
float scale, dequantized inside the jitted matmul — weights stream from HBM
at 1 byte/param (the AR decode hot loops are bandwidth-bound, so this is
the same win the reference gets on CPU).

`dense(x, w)` is the quant-aware matmul used by the model code: it accepts
either a plain array or a QTensor.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["QTensor", "QTensor4", "QTensorG", "quantize_int8",
           "quantize_int4", "dequantize", "dense", "quantize_pytree"]


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "scale"], meta_fields=[])
@dataclasses.dataclass
class QTensor:
    """Per-output-channel symmetric int8: w ≈ q * scale.
    q: (..., in, out) int8; scale: (out,) float32."""

    q: jax.Array
    scale: jax.Array

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.scale.dtype


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "scale"], meta_fields=["group_size"])
@dataclasses.dataclass
class QTensor4:
    """Group-wise symmetric int4, two nibbles packed per int8 along the
    input axis: w[2g] in the low nibble, w[2g+1] in the high nibble.
    q: (in//2, out) int8 packed; scale: (in//group_size, out) float32.

    This is the STORAGE form (artifacts at 0.5 byte/param). The decode
    hot loops run the unpacked QTensorG form — XLA cannot keep the
    nibble unpack fused into real-size matvec reads (the unpacked
    intermediate spills to HBM per step; measured 98 vs 1128 tok/s on
    the Kani decode), so quantize_pytree unpacks at load."""

    q: jax.Array
    scale: jax.Array
    group_size: int = 32

    @property
    def dtype(self):
        return self.scale.dtype

    def unpack_runtime(self) -> "QTensorG":
        return QTensorG(q=_unpack_int4_int8(self), scale=self.scale,
                        group_size=self.group_size)


@partial(jax.tree_util.register_dataclass,
         data_fields=["q", "scale"], meta_fields=["group_size"])
@dataclasses.dataclass
class QTensorG:
    """Group-wise symmetric int4 in RUNTIME form: values unpacked to an
    int8 container (1 byte/param streamed per decode step — int8-speed),
    scales applied per group AFTER the contraction. q: (in, out) int8 in
    [-7, 7]; scale: (in//group_size, out) float32. Re-packs losslessly
    to QTensor4 for artifacts (weights/save.py)."""

    q: jax.Array
    scale: jax.Array
    group_size: int = 32

    @property
    def shape(self):
        return self.q.shape

    @property
    def dtype(self):
        return self.scale.dtype

    def pack(self) -> QTensor4:
        q = jnp.asarray(self.q, jnp.int8)
        lo = q[0::2] & 0x0F
        hi = (q[1::2] & 0x0F) << 4
        return QTensor4(q=(lo | hi).astype(jnp.int8), scale=self.scale,
                        group_size=self.group_size)


def quantize_int8(w: jax.Array) -> QTensor:
    """Quantize a (..., in, out) weight per output channel (last axis)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)),
                   axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return QTensor(q=q, scale=scale.astype(jnp.float32))


def quantize_int4(w: jax.Array, group_size: int = 32,
                  search: bool = True) -> QTensor4:
    """Group-wise int4 (the reference's MatMulNBits analog,
    Kani_TTS/Optimize_ONNX.py:219-253). w: (in, out), in % (2*group) == 0.

    search=True runs the k_quant-style error-minimizing scale search the
    reference's DEFAULT_NBITS_ALGO='k_quant' performs (Kani_TTS/
    Optimize_ONNX.py:219-253): for each group, several scale candidates
    below amax/7 are rounded, each candidate's scale is then REFIT by
    least squares on its own rounding pattern (scale* = Σw·q / Σq²,
    the error-weighted step), and the (q, scale*) pair with the lowest
    reconstruction MSE wins. Allowing round-to ±8 saturation on the
    largest element usually beats pure RTN; measured on Gaussian
    weights: ~25-30%% lower weight MSE, ~20%% lower decode logits
    delta. search=False is plain RTN (scale = amax/7)."""
    cin, cout = w.shape
    if cin % group_size or group_size % 2:
        raise ValueError(f"in dim {cin} must divide even group {group_size}")
    wf = w.astype(jnp.float32).reshape(cin // group_size, group_size, cout)
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=1), 1e-8)    # (G, out)

    if not search:
        scale = amax / 7.0
        q = jnp.clip(jnp.round(wf / scale[:, None]), -7, 7)
    else:
        best_err = None
        best_q = None
        best_scale = None
        # denominators > 7 shrink the scale: the group's max saturates
        # (clips to ±7) while every other element quantizes finer —
        # k_quant's core trade. 14 candidates cover [amax/7 .. amax/9.4].
        for d in np.linspace(7.0, 9.4, 14):
            cand = amax / np.float32(d)
            q = jnp.clip(jnp.round(wf / cand[:, None]), -7, 7)
            # least-squares refit of the scale to this rounding pattern
            num = jnp.sum(wf * q, axis=1)                      # (G, out)
            den = jnp.maximum(jnp.sum(q * q, axis=1), 1e-8)
            s = num / den
            err = jnp.sum((wf - q * s[:, None]) ** 2, axis=1)  # (G, out)
            if best_err is None:
                best_err, best_q, best_scale = err, q, s
            else:
                take = err < best_err
                best_err = jnp.where(take, err, best_err)
                best_scale = jnp.where(take, s, best_scale)
                best_q = jnp.where(take[:, None], q, best_q)
        q, scale = best_q, jnp.maximum(jnp.abs(best_scale), 1e-12) \
            * jnp.sign(jnp.where(best_scale == 0, 1.0, best_scale))

    q = q.reshape(cin, cout).astype(jnp.int8)
    lo = q[0::2] & 0x0F
    hi = (q[1::2] & 0x0F) << 4
    packed = (lo | hi).astype(jnp.int8)                       # (in//2, out)
    return QTensor4(q=packed, scale=scale.astype(jnp.float32),
                    group_size=group_size)


def _unpack_int4_int8(qt: QTensor4) -> jax.Array:
    """Packed (in//2, out) -> integer (in, out) int8 (values in [-7, 7],
    scales NOT applied). Pure integer ops: XLA hoists this out of decode
    while_loops as a loop-invariant, so the in-loop weight traffic is
    1 byte/param — the int8-speed path. (The old form multiplied the
    fp32 group scales into the unpacked matrix; that multiply stayed
    INSIDE the decode loop and streamed 4 bytes/param every token —
    measured 98 tok/s vs 1128 int8 on the Kani decode.)"""
    raw = qt.q.astype(jnp.int32)
    lo = (raw & 0x0F)
    hi = ((raw >> 4) & 0x0F)
    # sign-extend 4-bit two's complement
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    cin2, cout = qt.q.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * cin2, cout
                                               ).astype(jnp.int8)


def _unpack_int4(qt: QTensor4) -> jax.Array:
    """Packed (in//2, out) -> dequantized fp32 (in, out)."""
    g = qt.group_size
    q = _unpack_int4_int8(qt)
    cout = q.shape[1]
    return (q.reshape(-1, g, cout).astype(jnp.float32)
            * qt.scale[:, None]).reshape(q.shape[0], cout)


def dequantize(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


def dense(x: jax.Array, w) -> jax.Array:
    """x @ w for plain arrays, int8 QTensors, or packed int4 QTensor4s.
    Quantized weights upcast inside the kernel (XLA fuses the cast into the
    matmul read); scales apply outside (int8) or during unpack (int4) —
    HBM traffic is 1 / 0.5 bytes per weight.

    (An int8-MXU Pallas kernel exists in ops/quant_matmul.py — its raw dot
    is ~1.4x the bf16 dot, but routing dense() through it measured SLOWER
    end-to-end on the F5 DiT: the standalone pallas_call breaks XLA's
    bias/gelu epilogue fusion. bf16 dequant-in-matmul stays the Q8 path.)"""
    if isinstance(w, QTensor):
        y = jnp.matmul(x, w.q.astype(x.dtype))
        return y * w.scale.astype(x.dtype)
    if isinstance(w, QTensor4):
        w = w.unpack_runtime()    # storage form reached a matmul directly
    if isinstance(w, QTensorG):
        # group-partial dots with the scales applied AFTER the contraction:
        # y = sum_g scale[g] * (x_g @ q_g) — same math as
        # dequantize-then-matmul (reassociated); only int8 values stream.
        cin, cout = w.q.shape
        g = w.group_size
        xg = x.reshape(*x.shape[:-1], cin // g, g)
        partial = jnp.einsum(
            "...gk,gkn->...gn", xg.astype(x.dtype),
            w.q.reshape(cin // g, g, cout).astype(x.dtype),
            preferred_element_type=jnp.float32)       # (..., G, out)
        y = jnp.sum(partial * w.scale, axis=-2)
        return y.astype(x.dtype)
    return jnp.matmul(x, w)


# Keys eligible for weight-only quantization in the model pytrees (matmul
# weights of the AR transformer stacks — codecs/DSP stay float, matching
# the reference's per-model dtype policy).
_DEFAULT_KEYS = ("wqkv", "wo", "w_gate_up", "w_down", "in_proj", "out_proj",
                 "lm_head")


# jitted per-tensor quantizers for quantize_pytree: the eager quantizers
# dispatch each jnp op separately, which over the remote-TPU tunnel
# (~6 ms/call) turns the int4 scale search (14 candidates x ~6 ops per
# tensor) into minutes for a 370m tree. One compiled program per distinct
# weight shape (a model has only a handful) makes the whole-tree
# quantize seconds instead. Same math, same outputs.
@partial(jax.jit, static_argnames=("group_size", "search"))
def _quantize_int4_runtime_jit(v, group_size, search=True):
    return quantize_int4(v, group_size, search=search).unpack_runtime()


_quantize_int8_jit = jax.jit(lambda v: quantize_int8(v))


def quantize_pytree(params, keys: tuple[str, ...] = _DEFAULT_KEYS,
                    min_size: int = 1 << 16, bits: int = 8,
                    group_size: int = 32, search: bool = True):
    """Replace eligible float matmul weights with QTensors (weights reached
    through dict keys in `keys`, ndim >= 2, at least `min_size` elements).
    bits=8 -> per-channel int8; bits=4 -> group-wise packed int4 (2-D
    weights whose input dim divides the group size; others fall back to
    int8). `search` selects the int4 scale algorithm: True = k_quant-style
    error-minimizing search (the reference's DEFAULT_NBITS_ALGO,
    Kani_TTS/Optimize_ONNX.py:219-253), False = plain RTN."""

    def quant(v):
        if bits == 4 and v.ndim == 2 and v.shape[0] % group_size == 0:
            # runtime form: int8-container values + group scales (the
            # packed QTensor4 is the artifact format; weights/save.py
            # re-packs on save)
            return _quantize_int4_runtime_jit(v, group_size, search)
        return _quantize_int8_jit(v)

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k in keys and hasattr(v, "ndim") and v.ndim >= 2
                        and v.size >= min_size
                        and jnp.issubdtype(v.dtype, jnp.floating)):
                    out[k] = quant(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        return node

    return walk(params)
