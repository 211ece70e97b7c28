"""Token-selection primitives: greedy, repetition penalty, top-k.

Pure-jnp replacements for the reference's decode-strategy ONNX graphlets
(GREEDY_SEARCH / APPLY_PENALTY / ARGMAX — Kani_TTS/Export_Kani_TTS.py:81-188,
Qwen_TTS/Export_Qwen_TTS_ONNX.py:1260-1357). They compose inside the jitted
decode step rather than being separate session calls.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["greedy", "apply_repetition_penalty"]


def greedy(logits: jax.Array) -> jax.Array:
    """(B, V) -> (B,) int32 argmax token ids."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def apply_repetition_penalty(
    logits: jax.Array,       # (B, V)
    save_ids: jax.Array,     # (B, max_len) decoded-token ring buffer
    num_decoded: jax.Array,  # () int32 — tokens decoded so far
    penalty: float,
    penalty_range: int,
) -> jax.Array:
    """Multiply the logits of the last `penalty_range` decoded ids by `penalty`.

    Matches the reference semantics (gather → ×penalty → scatter, applied only
    once the window is full: Kani_TTS/Inference_Kani_TTS_ONNX.py:335-338).
    """
    b, v = logits.shape
    penalty_range = min(penalty_range, save_ids.shape[1])

    def _apply(lg):
        start = jnp.maximum(num_decoded - penalty_range, 0)
        window = jax.lax.dynamic_slice(
            save_ids, (0, start.astype(jnp.int32)), (b, penalty_range)
        )  # (B, R)
        rows = jnp.arange(b)[:, None]
        vals = lg[rows, window] * penalty
        return lg.at[rows, window].set(vals)

    return jax.lax.cond(num_decoded >= penalty_range, _apply, lambda lg: lg, logits)
