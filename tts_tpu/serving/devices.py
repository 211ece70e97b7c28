"""Per-device pipeline replication for multi-chip serving.

TTS requests are independent, so serving scales across chips as pure
data parallelism with zero collectives: one pipeline (and one slot
server) per chip, a host-side least-loaded router in front
(serving/router.SlotRouter). This module builds the per-chip pipelines:
`replicate_pipeline` shallow-copies a constructed pipeline with every
jax-array attribute (params, codec/vocoder params, precomputed tables)
placed on the target device via `jax.device_put`. Jitted programs
follow their arguments' placement, so the clones share the original's
decode-program caches — each device compiles its own executable on
first use, but tracing work is shared.

The reference is single-stream single-device (SURVEY.md §2.9); this is
beyond-reference capability.
"""
from __future__ import annotations

import copy

import jax

__all__ = ["pipeline_device", "replicate_pipeline", "pipelines_for_devices"]


def pipeline_device(pipe):
    """The device holding `pipe`'s parameters (first array leaf)."""
    for leaf in jax.tree_util.tree_leaves(getattr(pipe, "params", None)):
        if isinstance(leaf, jax.Array):
            return next(iter(leaf.devices()))
    raise ValueError("pipeline has no jax-array params attribute")


def replicate_pipeline(pipe, device):
    """A shallow copy of `pipe` with every attribute that contains jax
    arrays moved to `device` (committed placement). Non-array attributes
    (configs, tokenizers, jit caches) are shared with the original —
    cached jitted programs take params as arguments (the repo-wide
    rule), so placement follows the clone's arrays.

    Pipelines constructed with `mesh=` shard over devices already and
    cannot be replicated per-device on top of that.
    """
    if getattr(pipe, "mesh", None) is not None:
        raise ValueError("cannot replicate a mesh-sharded pipeline; "
                         "per-device serving and in-batch dp are "
                         "alternatives, not layers")
    clone = copy.copy(pipe)
    for name, val in list(vars(clone).items()):
        leaves = jax.tree_util.tree_leaves(val)
        if any(isinstance(leaf, jax.Array) for leaf in leaves):
            setattr(clone, name, jax.device_put(val, device))
    return clone


def pipelines_for_devices(pipe, devices=None) -> list:
    """One pipeline per device (default: every local device), each a
    `replicate_pipeline` clone. Pass the result straight to
    `serving.families.continuous_server` — it builds one slot server
    per pipeline behind a least-loaded SlotRouter."""
    if devices is None:
        devices = jax.local_devices()
    return [replicate_pipeline(pipe, d) for d in devices]
