"""KaniTTS checkpoint loaders: HF LFM2 acoustic LM + NeMo NanoCodec .nemo.

Consumes the same artifacts as the reference (Export_Kani_TTS.py:17-18:
kani-tts-370m HF dir + nemo-nano-codec-22khz .nemo tar) and applies the
reference's export-time folds at load (Export_Kani_TTS.py:290-365):
  * operator_norm absorbed into the fused QKV / conv in_proj;
  * ffn_norm absorbed into w1/w3 (fused gate_up here);
  * embedding_norm absorbed into lm_head;
  * attention scale d^-0.25 folded into each of the q/k per-head norms;
  * codec weight-norm collapsed, 32767 output scale folded into post_conv
    (Export_Kani_TTS.py:519-526).

Note: the reference folds norm_weight * sqrt(H) because its RMSNorm is
sum-based; ours is mean-based so only norm_weight is folded — identical math.
"""
from __future__ import annotations

import io
import json
import os
import tarfile
from typing import Mapping

import numpy as np

import jax.numpy as jnp

from ..models.kani import KaniConfig
from ..models.nanocodec import NanoCodecConfig
from .loaders import collapse_weight_norm

__all__ = ["load_kani_lm", "kani_params_from_state_dict",
           "load_nanocodec", "nanocodec_params_from_state_dict"]


# --------------------------------------------------------------------------
# LFM2 acoustic LM

def kani_config_from_json(path: str) -> KaniConfig:
    with open(path) as f:
        c = json.load(f)
    layer_types = tuple(
        "attn" if t == "full_attention" else "conv" for t in c["layer_types"]
    )
    hidden = c["hidden_size"]
    heads = c["num_attention_heads"]
    return KaniConfig(
        hidden_size=hidden,
        num_heads=heads,
        num_kv_heads=c["num_key_value_heads"],
        head_dim=c.get("head_dim") or hidden // heads,
        ffn_dim=c.get("block_ff_dim") or c.get("intermediate_size"),
        vocab_size=c["vocab_size"],
        layer_types=layer_types,
        conv_kernel=c.get("conv_L_cache", 3),
        rope_base=c.get("rope_theta", 1000000.0),
        rms_eps=c.get("norm_eps", 1e-5),
    )


def _load_hf_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    """Load safetensors shards (or pytorch_model.bin) from an HF dir."""
    sds: dict[str, np.ndarray] = {}
    st_files = sorted(
        f for f in os.listdir(model_dir) if f.endswith(".safetensors")
    )
    if st_files:
        from safetensors.numpy import load_file

        for f in st_files:
            sds.update(load_file(os.path.join(model_dir, f)))
        return sds
    import torch

    obj = torch.load(os.path.join(model_dir, "pytorch_model.bin"),
                     map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in obj.items()}


def kani_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: KaniConfig, dtype=jnp.float32
):
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "kani-lm")
    scale = cfg.head_dim ** -0.25
    layers = []
    for i, lt in enumerate(cfg.layer_types):
        pre = f"model.layers.{i}"
        op_norm = sd[f"{pre}.operator_norm.weight"][None, :]   # (1, H)
        ffn_norm = sd[f"{pre}.ffn_norm.weight"][None, :]
        p = {"ffn": {
            "w_gate_up": jnp.asarray(np.concatenate(
                [(sd[f"{pre}.feed_forward.w1.weight"] * ffn_norm).T,
                 (sd[f"{pre}.feed_forward.w3.weight"] * ffn_norm).T], axis=-1
            ), dtype),
            "w_down": jnp.asarray(sd[f"{pre}.feed_forward.w2.weight"].T, dtype),
        }}
        if lt == "attn":
            a = f"{pre}.self_attn"
            wqkv = np.concatenate(
                [sd[f"{a}.q_proj.weight"] * op_norm,
                 sd[f"{a}.k_proj.weight"] * op_norm,
                 sd[f"{a}.v_proj.weight"] * op_norm], axis=0
            ).T
            p.update(
                wqkv=jnp.asarray(wqkv, dtype),
                q_norm=jnp.asarray(sd[f"{a}.q_layernorm.weight"] * scale, dtype),
                k_norm=jnp.asarray(sd[f"{a}.k_layernorm.weight"] * scale, dtype),
                wo=jnp.asarray(sd[f"{a}.out_proj.weight"].T, dtype),
            )
        else:
            c = f"{pre}.conv"
            conv_w = sd[f"{c}.conv.weight"]                    # (H, 1, K)
            p.update(
                in_proj=jnp.asarray((sd[f"{c}.in_proj.weight"] * op_norm).T, dtype),
                conv_w=jnp.asarray(np.transpose(conv_w, (2, 1, 0)), dtype),
                out_proj=jnp.asarray(sd[f"{c}.out_proj.weight"].T, dtype),
            )
            if f"{c}.conv.bias" in sd:
                p["conv_b"] = jnp.asarray(sd[f"{c}.conv.bias"], dtype)
        layers.append(p)

    emb_norm = sd["model.embedding_norm.weight"][None, :]
    lm_head = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    from ..nn.rope import rope_table

    rope_cos, rope_sin = rope_table(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)
    return {
        "embed": jnp.asarray(sd["model.embed_tokens.weight"], dtype),
        "layers": layers,
        "lm_head": jnp.asarray((lm_head * emb_norm).T, dtype),
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
    }


def load_kani_lm(model_dir: str, dtype=jnp.float32):
    from .loaders import CheckpointDict

    cfg = kani_config_from_json(os.path.join(model_dir, "config.json"))
    sd = CheckpointDict(_load_hf_state_dict(model_dir), "kani-lm")
    params = kani_params_from_state_dict(sd, cfg, dtype)
    sd.warn_unused()
    return params, cfg


# --------------------------------------------------------------------------
# NanoCodec (.nemo tar = model_config.yaml + model_weights.ckpt)

def _read_nemo(nemo_path: str):
    """Extract (config dict, torch state dict) from a .nemo tar without NeMo
    (replicating the restore path the reference patches in
    modeling_modified/common.py:61-110)."""
    import torch
    import yaml

    cfg = sd = None
    with tarfile.open(nemo_path) as tar:
        for m in tar.getmembers():
            name = os.path.basename(m.name)
            if name == "model_config.yaml":
                cfg = yaml.safe_load(tar.extractfile(m).read())
            elif name in ("model_weights.ckpt", "model_weights.pt"):
                sd = torch.load(io.BytesIO(tar.extractfile(m).read()),
                                map_location="cpu", weights_only=True)
    if cfg is None or sd is None:
        raise FileNotFoundError(f"{nemo_path}: missing config or weights")
    return cfg, {k: v.numpy() for k, v in sd.items()}


def nanocodec_config_from_yaml(cfg: dict) -> NanoCodecConfig:
    dec = cfg["audio_decoder"]
    vq = cfg["vector_quantizer"]
    levels = tuple(vq.get("codebook_dim_levels") or vq.get("num_levels")
                   or (9, 8, 8, 7))
    groups = int(vq.get("num_groups", 4))
    return NanoCodecConfig(
        num_groups=groups,
        dims_per_group=len(levels),
        levels=levels,
        codebook_size=int(np.prod(levels)),
        base_channels=int(dec.get("base_channels", 864)),
        up_sample_rates=tuple(dec.get("up_sample_rates", (7, 7, 6, 6))),
        activation=dec.get("activation", "half_snake"),
        sample_rate=int(cfg.get("sample_rate", 22050)),
    )


def _wn_conv(sd: Mapping[str, np.ndarray], prefix: str, transposed=False,
             dtype=jnp.float32):
    """Conv with torch parametrized weight-norm (parametrizations.weight.
    original0/original1) or plain weight; -> WIO layout."""
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
        w = collapse_weight_norm(g, v)
    elif f"{prefix}.weight_g" in sd:
        w = collapse_weight_norm(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
    else:
        w = sd[f"{prefix}.weight"]
    w = np.transpose(w, (2, 0, 1) if transposed else (2, 1, 0))
    p = {"w": jnp.asarray(w, dtype)}
    if f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{prefix}.bias"], dtype)
    return p


def _codec_act(sd: Mapping[str, np.ndarray], prefix: str, dtype=jnp.float32):
    """CodecActivation params: snake alpha (stored linear-scale in NeMo)."""
    for key in (f"{prefix}.snake.alpha", f"{prefix}.alpha",
                f"{prefix}.snake_act.alpha"):
        if key in sd:
            alpha = sd[key].reshape(-1).astype(np.float64)
            return {"alpha": jnp.asarray(alpha, dtype),
                    "alpha_recip": jnp.asarray(1.0 / (alpha + 1e-9), dtype)}
    return {}   # lrelu — no params


def nanocodec_params_from_state_dict(
    sd: Mapping[str, np.ndarray], cfg: NanoCodecConfig, dtype=jnp.float32,
    out_scale: float = 1.0,
):
    """out_scale: optionally fold the int16 scale into post_conv like the
    reference (Export_Kani_TTS.py:524-526); the runtime pipeline scales
    after clipping instead, so the default keeps weights unscaled."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "nanocodec")
    d = "audio_decoder"
    params = {
        "pre_conv": _wn_conv(sd, f"{d}.pre_conv.conv", dtype=dtype),
        "stage_acts": [
            _codec_act(sd, f"{d}.activations.{i}", dtype)
            for i in range(len(cfg.up_sample_rates))
        ],
        "ups": [
            _wn_conv(sd, f"{d}.up_sample_conv_layers.{i}.conv",
                     transposed=True, dtype=dtype)
            for i in range(len(cfg.up_sample_rates))
        ],
        "res_layers": [],
        "post_act": _codec_act(sd, f"{d}.post_activation", dtype),
    }
    for i in range(len(cfg.up_sample_rates)):
        blocks = []
        for j in range(len(cfg.kernel_sizes)):
            rb = f"{d}.res_layers.{i}.res_blocks.{j}.res_blocks"
            blocks.append({
                "acts1": [_codec_act(sd, f"{rb}.{k}.input_activation", dtype)
                          for k in range(len(cfg.dilations))],
                "convs1": [_wn_conv(sd, f"{rb}.{k}.input_conv.conv", dtype=dtype)
                           for k in range(len(cfg.dilations))],
                "acts2": [_codec_act(sd, f"{rb}.{k}.skip_activation", dtype)
                          for k in range(len(cfg.dilations))],
                "convs2": [_wn_conv(sd, f"{rb}.{k}.skip_conv.conv", dtype=dtype)
                           for k in range(len(cfg.dilations))],
            })
        params["res_layers"].append(blocks)
    post = _wn_conv(sd, f"{d}.post_conv.conv", dtype=dtype)
    post["w"] = post["w"] * out_scale
    if "b" in post:
        post["b"] = post["b"] * out_scale
    params["post_conv"] = post
    return params


def load_nanocodec(nemo_path: str, dtype=jnp.float32):
    from .loaders import CheckpointDict

    ycfg, sd = _read_nemo(nemo_path)
    cfg = nanocodec_config_from_yaml(ycfg)
    sd = CheckpointDict(sd, "nanocodec")
    params = nanocodec_params_from_state_dict(sd, cfg, dtype)
    # .nemo checkpoints carry the encoder + discriminator; decode-only here
    sd.warn_unused(ignore_substrings=("discriminator", "audio_encoder",
                                      "encoder."))
    return params, cfg
