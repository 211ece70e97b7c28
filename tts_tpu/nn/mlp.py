"""MLP blocks: fused gate/up SwiGLU and tanh-GELU feed-forward.

The reference fuses gate_proj/up_proj into one matmul with the preceding
RMSNorm weight absorbed (SURVEY.md §2.8 item 3) and swaps exact GELU for the
tanh approximation everywhere (item 9). Both are the natural TPU forms: one
wide matmul on the MXU, tanh-GELU fused into it by XLA.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["swiglu", "gelu_tanh", "gelu_mlp"]


def swiglu(x: jax.Array, w_gate_up: jax.Array, w_down: jax.Array,
           b_gate_up: jax.Array | None = None, b_down: jax.Array | None = None):
    """x @ [Wg | Wu] -> silu(g) * u -> @ Wd.  w_gate_up: (in, 2*ff)."""
    gu = jnp.matmul(x, w_gate_up)
    if b_gate_up is not None:
        gu = gu + b_gate_up
    gate, up = jnp.split(gu, 2, axis=-1)
    h = jax.nn.silu(gate) * up
    out = jnp.matmul(h, w_down)
    if b_down is not None:
        out = out + b_down
    return out


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def gelu_mlp(x: jax.Array, w1: jax.Array, b1, w2: jax.Array, b2):
    h = jnp.matmul(x, w1)
    if b1 is not None:
        h = h + b1
    h = gelu_tanh(h)
    out = jnp.matmul(h, w2)
    if b2 is not None:
        out = out + b2
    return out
