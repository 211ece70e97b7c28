"""F5-TTS + Vocos checkpoint loaders.

Reads the same upstream artifacts the reference consumes
(/root/reference/F5_TTS/Export_F5.py:21-24: SWivid/F5-TTS
model_1250000.safetensors + vocab.txt, charactr/vocos-mel-24khz) and applies
the reference's export-time transforms at load time:
  * EMA weight selection (Export_F5.py:206 load_checkpoint use_ema=True);
  * attention-scale folding: Wq,Wk (and biases) *= head_dim**-0.25
    (Export_F5.py:329-333), then QKV concatenated into one matmul;
  * Vocos layer-scale gamma folded into pwconv2 (Export_F5.py:400-402);
  * torch (out, in) linears transposed to (in, out); convs to WIO.
"""
from __future__ import annotations

import os
from typing import Mapping

import numpy as np

import jax.numpy as jnp

from ..models.f5 import (
    F5Config,
    _text_freqs_cis,
    attach_mod_tables,
    f5_rope_tables,
    f5_time_embed_table,
    f5_time_schedule,
    hs_perm,
)
from ..models.vocos import VocosConfig

__all__ = ["load_f5_vocab", "load_f5", "load_vocos",
           "f5_params_from_state_dict", "vocos_params_from_state_dict"]


def load_f5_vocab(path: str) -> dict[str, int]:
    """vocab.txt -> {char: idx} (Export_F5.py:75-80; lines keep their
    trailing-newline-stripped content, including the leading space entry)."""
    vocab = {}
    with open(path, encoding="utf-8") as f:
        for i, line in enumerate(f):
            vocab[line[:-1] if line.endswith("\n") else line] = i
    return vocab


def _load_safetensors(path: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def _strip_ema(sd: Mapping[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Select EMA weights when present (keys 'ema_model.<name>'), mirroring
    f5_tts load_checkpoint(use_ema=True)."""
    ema = {
        k[len("ema_model."):]: v
        for k, v in sd.items()
        if k.startswith("ema_model.") and k not in
        ("ema_model.initted", "ema_model.step")
    }
    return ema if ema else dict(sd)


def _lin(sd, prefix, dtype=jnp.float32):
    p = {"w": jnp.asarray(sd[f"{prefix}.weight"].T, dtype)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
    return p


def _conv(sd, prefix, dtype=jnp.float32):
    p = {"w": jnp.asarray(np.transpose(sd[f"{prefix}.weight"], (2, 1, 0)), dtype)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
    return p


def _ln(sd, prefix, dtype=jnp.float32):
    return {"w": jnp.asarray(sd[f"{prefix}.weight"], dtype),
            "b": jnp.asarray(sd[f"{prefix}.bias"], dtype)}


def f5_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: F5Config, dtype=jnp.float32
):
    """Upstream DiT state dict (transformer.* keys) -> f5.py pytree."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "f5")
    scale = cfg.head_dim ** -0.25
    t = "transformer"

    # per-head q/k column permutation to the half-split rope layout
    # (models/f5.hs_perm) — exact reordering, folded at load like the scale
    heads = cfg.inner_dim // cfg.head_dim
    col_perm = (np.arange(cfg.inner_dim).reshape(heads, cfg.head_dim)
                [:, hs_perm(cfg.head_dim)].reshape(-1))

    def attn_p(i):
        pre = f"{t}.transformer_blocks.{i}.attn"
        wq = (sd[f"{pre}.to_q.weight"].T * scale)[:, col_perm]
        wk = (sd[f"{pre}.to_k.weight"].T * scale)[:, col_perm]
        wv = sd[f"{pre}.to_v.weight"].T
        bq = (sd[f"{pre}.to_q.bias"] * scale)[col_perm]
        bk = (sd[f"{pre}.to_k.bias"] * scale)[col_perm]
        bv = sd[f"{pre}.to_v.bias"]
        return {
            "wqkv": jnp.asarray(np.concatenate([wq, wk, wv], axis=-1), dtype),
            "bqkv": jnp.asarray(np.concatenate([bq, bk, bv]), dtype),
            "wo": jnp.asarray(sd[f"{pre}.to_out.0.weight"].T, dtype),
            "bo": jnp.asarray(sd[f"{pre}.to_out.0.bias"], dtype),
        }

    def convnext_v2(pre):
        return {
            "dwconv": _conv(sd, f"{pre}.dwconv", dtype),
            "norm": _ln(sd, f"{pre}.norm", dtype),
            "pw1": _lin(sd, f"{pre}.pwconv1", dtype),
            "grn": {"gamma": jnp.asarray(sd[f"{pre}.grn.gamma"], dtype),
                    "beta": jnp.asarray(sd[f"{pre}.grn.beta"], dtype)},
            "pw2": _lin(sd, f"{pre}.pwconv2", dtype),
        }

    params = {
        "text_embed": {
            "embed": jnp.asarray(sd[f"{t}.text_embed.text_embed.weight"], dtype),
            "blocks": [
                convnext_v2(f"{t}.text_embed.text_blocks.{i}")
                for i in range(cfg.conv_layers)
            ],
        },
        "text_freqs_cis": jnp.asarray(_text_freqs_cis(cfg.text_dim, 4096), dtype),
        "input_embed": {
            "proj": _lin(sd, f"{t}.input_embed.proj", dtype),
            "conv1": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.0", dtype),
            "conv2": _conv(sd, f"{t}.input_embed.conv_pos_embed.conv1d.2", dtype),
        },
        "blocks": [
            {
                "ada": _lin(sd, f"{t}.transformer_blocks.{i}.attn_norm.linear", dtype),
                "attn": attn_p(i),
                "ff1": _lin(sd, f"{t}.transformer_blocks.{i}.ff.ff.0.0", dtype),
                "ff2": _lin(sd, f"{t}.transformer_blocks.{i}.ff.ff.2", dtype),
            }
            for i in range(cfg.depth)
        ],
        "norm_out": _lin(sd, f"{t}.norm_out.linear", dtype),
        "proj_out": _lin(sd, f"{t}.proj_out", dtype),
    }

    rope_cos, rope_sin = f5_rope_tables(cfg.max_signal_len, cfg.head_dim)
    params["rope_cos"] = jnp.asarray(rope_cos, dtype)
    params["rope_sin"] = jnp.asarray(rope_sin, dtype)
    ts, dts = f5_time_schedule(cfg.nfe_steps, cfg.sway_coef)
    params["time_table"] = jnp.asarray(
        f5_time_embed_table(
            ts,
            sd[f"{t}.time_embed.time_mlp.0.weight"].T,
            sd[f"{t}.time_embed.time_mlp.0.bias"],
            sd[f"{t}.time_embed.time_mlp.2.weight"].T,
            sd[f"{t}.time_embed.time_mlp.2.bias"],
            cfg.freq_embed_dim,
        ),
        dtype,
    )
    params["delta_t"] = jnp.asarray(dts)    # fp32: Euler carry stays fp32
    return attach_mod_tables(params, cfg)


def load_f5(safetensors_path: str, vocab_path: str,
            cfg: F5Config | None = None, dtype=jnp.float32):
    """Returns (params, cfg, vocab)."""
    vocab = load_f5_vocab(vocab_path)
    if cfg is None:
        cfg = F5Config(vocab_size=len(vocab))
    from .loaders import CheckpointDict

    sd = CheckpointDict(_strip_ema(_load_safetensors(safetensors_path)), "f5")
    params = f5_params_from_state_dict(sd, cfg, dtype)
    # mel_spec.* buffers ride along in the upstream checkpoint; not params
    sd.warn_unused(ignore_substrings=("mel_spec",))
    return params, cfg, vocab


# --------------------------------------------------------------------------
# Vocos

def vocos_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: VocosConfig, dtype=jnp.float32
):
    """charactr/vocos-mel-24khz state dict -> vocos.py pytree; folds
    layer-scale gamma into pwconv2 (Export_F5.py:400-402)."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "vocos")

    def block(i):
        pre = f"backbone.convnext.{i}"
        gamma = sd[f"{pre}.gamma"]                        # (dim,)
        return {
            "dwconv": _conv(sd, f"{pre}.dwconv", dtype),
            "norm": _ln(sd, f"{pre}.norm", dtype),
            "pw1": _lin(sd, f"{pre}.pwconv1", dtype),
            "pw2": {
                "w": jnp.asarray(sd[f"{pre}.pwconv2.weight"].T * gamma[None, :], dtype),
                "b": jnp.asarray(sd[f"{pre}.pwconv2.bias"] * gamma, dtype),
            },
        }

    return {
        "embed": _conv(sd, "backbone.embed", dtype),
        "norm": _ln(sd, "backbone.norm", dtype),
        "blocks": [block(i) for i in range(cfg.num_layers)],
        "final_norm": _ln(sd, "backbone.final_layer_norm", dtype),
        "head": _lin(sd, "head.out", dtype),
    }


def load_vocos(model_dir: str, cfg: VocosConfig | None = None, dtype=jnp.float32):
    """Load a charactr/vocos-mel-24khz style dir (pytorch_model.bin)."""
    import torch

    cfg = cfg or VocosConfig()
    path = os.path.join(model_dir, "pytorch_model.bin")
    obj = torch.load(path, map_location="cpu", weights_only=True)
    from .loaders import CheckpointDict

    sd = CheckpointDict(
        {k: v.numpy() for k, v in obj.items() if hasattr(v, "numpy")},
        "vocos")
    params = vocos_params_from_state_dict(sd, cfg, dtype)
    # feature_extractor.* (mel frontend) is replaced by audio/mel.py
    sd.warn_unused(ignore_substrings=("feature_extractor",))
    return params, cfg
