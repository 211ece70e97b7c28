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

__all__ = ["QTensor", "quantize_int8", "dequantize", "dense",
           "quantize_pytree"]


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


def quantize_int8(w: jax.Array) -> QTensor:
    """Quantize a (..., in, out) weight per output channel (last axis)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)),
                   axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127
                 ).astype(jnp.int8)
    return QTensor(q=q, scale=scale.astype(jnp.float32))


def dequantize(qt: QTensor, dtype=jnp.bfloat16) -> jax.Array:
    return (qt.q.astype(jnp.float32) * qt.scale).astype(dtype)


def dense(x: jax.Array, w) -> jax.Array:
    """x @ w for plain arrays or QTensors. For QTensors the int8 weight is
    upcast to the activation dtype inside the kernel (XLA fuses the cast
    into the matmul read) and the per-channel scale applies to the output —
    HBM traffic is 1 byte/weight."""
    if isinstance(w, QTensor):
        y = jnp.matmul(x, w.q.astype(x.dtype))
        return y * w.scale.astype(x.dtype)
    return jnp.matmul(x, w)


# Keys eligible for weight-only quantization in the model pytrees (matmul
# weights of the AR transformer stacks — codecs/DSP stay float, matching
# the reference's per-model dtype policy).
_DEFAULT_KEYS = ("wqkv", "wo", "w_gate_up", "w_down", "in_proj", "out_proj",
                 "lm_head")


def quantize_pytree(params, keys: tuple[str, ...] = _DEFAULT_KEYS,
                    min_size: int = 1 << 16):
    """Replace eligible float matmul weights with QTensors (weights reached
    through dict keys in `keys`, ndim >= 2, at least `min_size` elements)."""

    def walk(node):
        if isinstance(node, dict):
            out = {}
            for k, v in node.items():
                if (k in keys and hasattr(v, "ndim") and v.ndim >= 2
                        and v.size >= min_size
                        and jnp.issubdtype(v.dtype, jnp.floating)):
                    out[k] = quantize_int8(v)
                else:
                    out[k] = walk(v)
            return out
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        return node

    return walk(params)
