"""Device-mesh and sharding utilities.

The reference has no distributed execution (SURVEY.md §2.9) — its
"communication backend" is ONNX Runtime EP selection. The TPU-native
equivalent is jax.sharding over ICI: a (dp, tp) Mesh, NamedSharding
annotations on the parameter pytree, and XLA-inserted collectives. Single
chip remains the default; these helpers make the multi-chip path a
one-liner for batch (dp) or weight (tp) scaling.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_params_tp", "replicate", "dp_shard"]


def make_mesh(dp: int = 1, tp: int | None = None,
              axis_names: tuple[str, str] = ("dp", "tp")) -> Mesh:
    """Build a (dp, tp) mesh over the available devices. tp defaults to
    filling the remaining devices."""
    n = len(jax.devices())
    if tp is None:
        tp = n // dp
    if dp < 1 or tp < 1 or dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp * tp} devices, have {n}")
    devices = np.array(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devices, axis_names)


def shard_params_tp(params, mesh: Mesh, axis: str = "tp"):
    """Tensor-parallel layout: shard every matmul weight on its output
    (last) axis when divisible; replicate everything else. XLA inserts the
    all-reduces on the following contractions."""
    tp = mesh.shape[axis]

    def spec(a):
        if a.ndim >= 2 and a.shape[-1] % tp == 0 and a.shape[-1] >= tp:
            return NamedSharding(mesh, P(*([None] * (a.ndim - 1)), axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(lambda a: jax.device_put(a, spec(a)), params)


def replicate(params, mesh: Mesh):
    """Replicate a pytree across the whole mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, s), params)


def dp_shard(mesh: Mesh, arr, axis: str = "dp"):
    """Commit a host (B, ...) batch array to the mesh with its leading axis
    sharded over `axis` and the rest replicated. Batched-serving entry
    points use this on their request buffers; with params replicated, jit
    then compiles the whole decode SPMD with the batch split across chips."""
    spec = P(axis, *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))
