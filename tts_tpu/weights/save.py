"""Save/load fused parameter pytrees.

The reference's Optimize_ONNX pipelines persist post-surgery artifacts so
inference skips the export work (SURVEY.md §1 L2). The analog here: after a
loader applies the fusion pass (and optionally quantization), persist the
pytree to one .npz so later runs skip torch/safetensors parsing and the
fold math. Quantized leaves (QTensor / QTensor4) round-trip.
"""
from __future__ import annotations

import numpy as np

from ..quant.weight_only import QTensor, QTensor4, QTensorG

__all__ = ["save_params", "load_params", "config_to_dict", "config_from_dict"]

_SEP = "||"


def _flatten(node, prefix, out):
    if isinstance(node, dict):
        for k, v in node.items():
            _flatten(v, f"{prefix}/{k}", out)
    elif isinstance(node, (list, tuple)):
        out[f"{prefix}{_SEP}listlen"] = np.asarray(len(node))
        for i, v in enumerate(node):
            _flatten(v, f"{prefix}/{i}", out)
    elif isinstance(node, QTensor):
        out[f"{prefix}{_SEP}q8.q"] = np.asarray(node.q)
        out[f"{prefix}{_SEP}q8.scale"] = np.asarray(node.scale)
    elif isinstance(node, QTensorG):
        # runtime int4 re-packs to nibbles for the artifact (0.5 B/param);
        # load_params unpacks back to the runtime form
        packed = node.pack()
        out[f"{prefix}{_SEP}q4r.q"] = np.asarray(packed.q)
        out[f"{prefix}{_SEP}q4r.scale"] = np.asarray(packed.scale)
        out[f"{prefix}{_SEP}q4r.group"] = np.asarray(packed.group_size)
    elif isinstance(node, QTensor4):
        out[f"{prefix}{_SEP}q4.q"] = np.asarray(node.q)
        out[f"{prefix}{_SEP}q4.scale"] = np.asarray(node.scale)
        out[f"{prefix}{_SEP}q4.group"] = np.asarray(node.group_size)
    elif node is None:
        out[f"{prefix}{_SEP}none"] = np.asarray(0)
    else:
        a = np.asarray(node)
        if a.dtype.itemsize == 2 and a.dtype.kind == "V" or str(
                a.dtype) == "bfloat16":
            # np.savez has no bfloat16: store the raw bits as uint16
            out[f"{prefix}{_SEP}bf16"] = a.view(np.uint16)
        else:
            out[f"{prefix}{_SEP}arr"] = a


def save_params(path: str, params) -> None:
    """Persist a parameter pytree (dicts/lists/arrays/QTensors) to .npz."""
    flat: dict[str, np.ndarray] = {}
    _flatten(params, "", flat)
    np.savez(path, **flat)


def load_params(path: str, device: bool = True):
    """Load a pytree saved by save_params. device=True puts leaves on the
    default JAX device (one transfer per leaf)."""
    import jax.numpy as jnp

    data = np.load(path)
    root: dict = {}
    q_accum: dict[str, dict] = {}

    def set_path(container, parts, value):
        for p in parts[:-1]:
            key = int(p) if p.isdigit() else p
            if isinstance(container, dict):
                container = container.setdefault(key, {})
            else:
                container = container[key]
        last = parts[-1]
        key = int(last) if last.isdigit() else last
        container[key] = value

    listlens: dict[tuple, int] = {}
    for name in data.files:
        prefix, kind = name.rsplit(_SEP, 1)
        parts = [p for p in prefix.split("/") if p != ""]
        if kind == "listlen":
            listlens[tuple(parts)] = int(data[name])
        elif kind == "arr":
            set_path(root, parts, jnp.asarray(data[name]) if device
                     else data[name])
        elif kind == "bf16":
            import ml_dtypes

            a = data[name].view(ml_dtypes.bfloat16)
            set_path(root, parts, jnp.asarray(a) if device else a)
        elif kind == "none":
            set_path(root, parts, None)
        else:
            q_accum.setdefault(prefix, {})[kind] = data[name]

    for prefix, fields in q_accum.items():
        parts = [p for p in prefix.split("/") if p != ""]
        if "q8.q" in fields:
            val = QTensor(q=jnp.asarray(fields["q8.q"]),
                          scale=jnp.asarray(fields["q8.scale"]))
        elif "q4r.q" in fields:
            val = QTensor4(q=jnp.asarray(fields["q4r.q"]),
                           scale=jnp.asarray(fields["q4r.scale"]),
                           group_size=int(fields["q4r.group"])
                           ).unpack_runtime()
        else:
            val = QTensor4(q=jnp.asarray(fields["q4.q"]),
                           scale=jnp.asarray(fields["q4.scale"]),
                           group_size=int(fields["q4.group"]))
        set_path(root, parts, val)

    def listify(node, path=()):
        if isinstance(node, dict):
            if path in listlens:
                n = listlens[path]
                return [listify(node[i], path + (str(i),)) for i in range(n)]
            return {k: listify(v, path + (str(k),)) for k, v in node.items()}
        return node

    return listify(root)


def config_to_dict(cfg) -> dict:
    """Frozen-dataclass config -> JSON-able dict (nested configs recurse)."""
    import dataclasses

    def conv(v):
        if dataclasses.is_dataclass(v):
            return {k: conv(w) for k, w in dataclasses.asdict(v).items()}
        if isinstance(v, tuple):
            return list(v)
        return v

    return {f.name: conv(getattr(cfg, f.name))
            for f in dataclasses.fields(cfg)}


def config_from_dict(cls, d: dict):
    """Rebuild a config dataclass from config_to_dict output. Nested config
    types are inferred from the class's default instances; lists restore to
    tuples when the default was a tuple."""
    import dataclasses

    kw = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        default = f.default
        if default is dataclasses.MISSING and f.default_factory is not dataclasses.MISSING:  # noqa: E501
            default = f.default_factory()
        if dataclasses.is_dataclass(default) and isinstance(v, dict):
            v = config_from_dict(type(default), v)
        elif isinstance(v, list):
            # configs only ever hold tuples, never lists
            v = tuple(v)
        kw[f.name] = v
    return cls(**kw)
