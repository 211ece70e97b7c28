"""Beam search as pure functions over (log-probs, KV cache batch rows).

Replaces the reference's FIRST_BEAM_SEARCH / SECOND_BEAM_SEARCH graphlets
(Kani_TTS/Export_Kani_TTS.py:93-165): step 1 expands a single hypothesis into
`beam_size` batch rows (tiling the KV cache); later steps take top_k per beam,
joint top-`beam_size` over beam×top_k, and reorder beams via batch gather.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["BeamState", "beam_init", "beam_step"]


class BeamState(NamedTuple):
    log_probs: jax.Array   # (beam, 1) cumulative log-probabilities
    tokens: jax.Array      # (beam,) int32 last-chosen token per beam
    parent: jax.Array      # (beam,) int32 index of the beam row each came from


def beam_init(logits: jax.Array, beam_size: int) -> BeamState:
    """First expansion from a single hypothesis. logits: (1, V)."""
    log_probs = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    top_lp, top_idx = jax.lax.top_k(log_probs[0], beam_size)
    return BeamState(
        log_probs=top_lp[:, None],
        tokens=top_idx.astype(jnp.int32),
        parent=jnp.zeros(beam_size, jnp.int32),
    )


def beam_step(
    logits: jax.Array,      # (beam, V)
    prev_log_probs: jax.Array,  # (beam, 1)
    beam_size: int,
    top_k: int,
) -> BeamState:
    lp = logits - jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    topk_lp, topk_idx = jax.lax.top_k(lp, top_k)                # (beam, top_k)
    joint = (topk_lp + prev_log_probs).reshape(-1)              # (beam*top_k,)
    best_lp, flat = jax.lax.top_k(joint, beam_size)
    parent = (flat // top_k).astype(jnp.int32)
    tokens = topk_idx.reshape(-1)[flat].astype(jnp.int32)
    return BeamState(log_probs=best_lp[:, None], tokens=tokens, parent=parent)
