"""VoxCPM-1.5 checkpoint loader (pytorch_model.bin / model.safetensors dir).

Consumes the upstream artifacts the reference loads via
VoxCPM.from_pretrained (/root/reference/VoxCPM/v1.5/modeling_modified/
core.py:59-122) and applies its export-time folds at load
(Export_VoxCPM_ONNX.py:385-458):
  * qkv fused with input RMSNorm absorbed, scale d^-0.25 into q/k;
  * gate/up fused with post-norm absorbed;
  * residual_lm final norm folded into res_to_dit_proj, feat-encoder final
    norm into enc_to_lm_proj, estimator final norm into out_proj;
  * lm_to_dit_proj and stop_proj fused into one matmul;
  * VAE weight-norm collapsed, 1/32768 folded into the encoder's first conv.
"""
from __future__ import annotations

import os
from typing import Mapping

import numpy as np

import jax.numpy as jnp

from ..models.voxcpm import LlamaStackConfig, VoxCPMConfig
from .loaders import collapse_weight_norm

__all__ = ["load_voxcpm", "llama_stack_from_state_dict",
           "vae_from_state_dict"]


def llama_stack_from_state_dict(sd: Mapping[str, np.ndarray], prefix: str,
                                cfg: LlamaStackConfig, dtype=jnp.float32,
                                residual_scale: float = 1.0):
    """Map `{prefix}.layers.{i}` MiniCPM/Llama weights with norm folds.
    residual_scale (MiniCPM scale_depth/sqrt(L)) folds into o_proj/down_proj
    (the v2 muP treatment, reference v2 Export:452-458)."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "voxcpm-lm")
    scale = cfg.head_dim ** -0.25
    layers = []
    for i in range(cfg.num_layers):
        p = f"{prefix}.layers.{i}"
        in_norm = np.asarray(sd[f"{p}.input_layernorm.weight"])[None, :]
        post_norm = np.asarray(sd[f"{p}.post_attention_layernorm.weight"])[None, :]
        wq = np.asarray(sd[f"{p}.self_attn.q_proj.weight"]) * in_norm * scale
        wk = np.asarray(sd[f"{p}.self_attn.k_proj.weight"]) * in_norm * scale
        wv = np.asarray(sd[f"{p}.self_attn.v_proj.weight"]) * in_norm
        layer = {
            "wqkv": jnp.asarray(np.concatenate([wq, wk, wv], axis=0).T, dtype),
            "wo": jnp.asarray(
                (np.asarray(sd[f"{p}.self_attn.o_proj.weight"])
                 * residual_scale).T, dtype),
            "w_gate_up": jnp.asarray(np.concatenate(
                [np.asarray(sd[f"{p}.mlp.gate_proj.weight"]) * post_norm,
                 np.asarray(sd[f"{p}.mlp.up_proj.weight"]) * post_norm],
                axis=0).T, dtype),
            "w_down": jnp.asarray(
                (np.asarray(sd[f"{p}.mlp.down_proj.weight"])
                 * residual_scale).T, dtype),
        }
        layers.append(layer)
    return {"layers": layers}


def _wn(sd, pre):
    """Collapse (parametrized) weight norm for a conv under `pre`."""
    for g_key, v_key in ((f"{pre}.weight_g", f"{pre}.weight_v"),
                         (f"{pre}.parametrizations.weight.original0",
                          f"{pre}.parametrizations.weight.original1")):
        if g_key in sd:
            return collapse_weight_norm(np.asarray(sd[g_key]),
                                        np.asarray(sd[v_key]))
    return np.asarray(sd[f"{pre}.weight"])


def _conv(sd, pre, dtype=jnp.float32, transposed=False, scale=1.0):
    w = _wn(sd, pre) * scale
    w = np.transpose(w, (2, 0, 1) if transposed else (2, 1, 0))
    p = {"w": jnp.asarray(w, dtype)}
    if f"{pre}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd[f"{pre}.bias"]) * scale, dtype)
    return p


def _snake(sd, pre, dtype=jnp.float32):
    alpha = np.asarray(sd[f"{pre}.alpha"]).reshape(-1).astype(np.float64)
    return {"alpha": jnp.asarray(alpha, dtype),
            "alpha_recip": jnp.asarray(1.0 / (alpha + 1e-9), dtype)}


def vae_from_state_dict(sd: Mapping[str, np.ndarray], cfg, dtype=jnp.float32):
    """audio_vae.* -> models/voxcpm.py VAE pytree. Encoder layout
    (audio_vae.py:130-161): block.0 = first conv, block.{1..} =
    CausalEncoderBlock(block = [unit x3, snake, down]); decoder
    (audio_vae.py:218-269): model.0 = pre conv, model.{1..} =
    CausalDecoderBlock(block = [snake, up, (noise), unit x3]),
    model.{-3,-2} = post snake + conv."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "voxcpm-vae")
    e = "audio_vae.encoder"
    enc_blocks = []
    for i, _ in enumerate(cfg.strides):
        b = f"{e}.block.{i + 1}.block"
        enc_blocks.append({
            "units": [
                {"s1": _snake(sd, f"{b}.{j}.block.0", dtype),
                 "c1": _conv(sd, f"{b}.{j}.block.1", dtype),
                 "s2": _snake(sd, f"{b}.{j}.block.2", dtype),
                 "c2": _conv(sd, f"{b}.{j}.block.3", dtype)}
                for j in range(3)
            ],
            "snake": _snake(sd, f"{b}.3", dtype),
            "down": _conv(sd, f"{b}.4", dtype),
        })
    d = "audio_vae.decoder.model"
    dec_rates = cfg.decoder_rates or tuple(reversed(cfg.strides))
    n = len(dec_rates)
    # depthwise decoder init (v1.5 and v2): model.0 = depthwise conv, model.1 =
    # pointwise, blocks start at index 2 and each pairs with a
    # sr_cond_model.{i} SampleRateConditionLayer (v2 Export:884-905)
    first_block = 2 if cfg.depthwise else 1
    dec_blocks = []
    for i in range(n):
        b = f"{d}.{i + first_block}.block"
        sr = f"audio_vae.decoder.sr_cond_model.{i + first_block}"
        off = 2
        blk = {
            "snake": _snake(sd, f"{b}.0", dtype),
            "up": _conv(sd, f"{b}.1", dtype, transposed=True),
        }
        has_noise = (f"{b}.2.linear.weight" in sd or
                     f"{b}.2.linear.parametrizations.weight.original0" in sd or
                     f"{b}.2.linear.weight_g" in sd)
        if has_noise:
            blk["noise"] = {"w": _conv(sd, f"{b}.2.linear", dtype)["w"]}
            off = 3
        blk["units"] = [
            {"s1": _snake(sd, f"{b}.{off + j}.block.0", dtype),
             "c1": _conv(sd, f"{b}.{off + j}.block.1", dtype),
             "s2": _snake(sd, f"{b}.{off + j}.block.2", dtype),
             "c2": _conv(sd, f"{b}.{off + j}.block.3", dtype)}
            for j in range(3)
        ]
        if f"{sr}.scale_embed.weight" in sd:
            blk["sr_scale"] = jnp.asarray(sd[f"{sr}.scale_embed.weight"], dtype)
            blk["sr_bias"] = jnp.asarray(sd[f"{sr}.bias_embed.weight"], dtype)
            if f"{sr}.out_layer.0.alpha" in sd:
                blk["sr_out_snake"] = _snake(sd, f"{sr}.out_layer.0", dtype)
                blk["sr_out_conv"] = _conv(sd, f"{sr}.out_layer.1", dtype)
        dec_blocks.append(blk)
    if cfg.depthwise:
        dec = {
            "pre_dw": _conv(sd, f"{d}.0", dtype),
            "pre": _conv(sd, f"{d}.1", dtype),
            "dec_blocks": dec_blocks,
            "post_snake": _snake(sd, f"{d}.{n + 2}", dtype),
            "post": _conv(sd, f"{d}.{n + 3}", dtype),
        }
    else:
        dec = {
            "pre": _conv(sd, f"{d}.0", dtype),
            "dec_blocks": dec_blocks,
            "post_snake": _snake(sd, f"{d}.{n + 1}", dtype),
            "post": _conv(sd, f"{d}.{n + 2}", dtype),
        }
    return {
        # reference folds 1/32768 into the first encoder conv (:90-93); we
        # keep float input in [-1, 1] so no scale is applied here
        "pre": _conv(sd, f"{e}.block.0", dtype),
        "enc_blocks": enc_blocks,
        "fc_mu": _conv(sd, f"{e}.fc_mu", dtype),
        "dec": dec,
    }


def load_voxcpm(model_dir: str, cfg: VoxCPMConfig | None = None,
                dtype=jnp.float32, use_mup: bool = False,
                scale_emb: float = 1.0, scale_depth: float = 1.0):
    """Returns (params, vae_params, cfg).

    VoxCPM-2 checkpoints use MiniCPM muP: pass use_mup=True with the
    config's scale_emb/scale_depth — the embedding scale folds into
    embed_tokens and scale_depth/sqrt(L) into o_proj/down_proj
    (reference v2 Export:361-363, 452-490)."""
    import math

    import torch

    path = os.path.join(model_dir, "pytorch_model.bin")
    if os.path.exists(path):
        obj = torch.load(path, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in obj.items() if hasattr(v, "numpy")}
    else:
        from safetensors.numpy import load_file

        sd = load_file(os.path.join(model_dir, "model.safetensors"))

    cfg = cfg or VoxCPMConfig()
    base_res = (scale_depth / math.sqrt(cfg.base.num_layers)
                if use_mup else 1.0)
    res_res = (scale_depth / math.sqrt(cfg.residual.num_layers)
               if use_mup else 1.0)
    est_norm = np.asarray(
        sd["feat_decoder.estimator.decoder.norm.weight"])[None, :]
    fe_norm = np.asarray(sd["feat_encoder.encoder.norm.weight"])[None, :]
    res_norm = np.asarray(sd["residual_lm.norm.weight"])[None, :]

    dit_w = np.asarray(sd["lm_to_dit_proj.weight"])
    stop_w = np.asarray(sd["stop_proj.weight"])
    params = {
        "embed": jnp.asarray(
            np.asarray(sd["base_lm.embed_tokens.weight"])
            * (scale_emb if use_mup else 1.0), dtype),
        "base": llama_stack_from_state_dict(sd, "base_lm", cfg.base, dtype,
                                            residual_scale=base_res),
        "base_norm": jnp.asarray(sd["base_lm.norm.weight"], dtype),
        "residual": llama_stack_from_state_dict(sd, "residual_lm",
                                                cfg.residual, dtype,
                                                residual_scale=res_res),
        "fsq_down": {"w": jnp.asarray(np.asarray(sd["fsq_layer.in_proj.weight"]).T, dtype),
                     "b": jnp.asarray(sd.get("fsq_layer.in_proj.bias",
                                             np.zeros(cfg.fsq_dim)), dtype)},
        "fsq_up": {"w": jnp.asarray(np.asarray(sd["fsq_layer.out_proj.weight"]).T, dtype),
                   "b": jnp.asarray(sd.get("fsq_layer.out_proj.bias",
                                           np.zeros(cfg.base.hidden_size)), dtype)},
        "dit_stop": {"w": jnp.asarray(
            np.concatenate([dit_w, stop_w], axis=0).T, dtype)},
        "res_to_dit": {"w": jnp.asarray(
            (np.asarray(sd["res_to_dit_proj.weight"]) * res_norm).T, dtype)},
        "stop_head": {"w": jnp.asarray(np.asarray(sd["stop_head.weight"]).T, dtype),
                      "b": jnp.asarray(sd.get("stop_head.bias", np.zeros(2)), dtype)},
        "fe": llama_stack_from_state_dict(sd, "feat_encoder.encoder",
                                          cfg.feat_encoder, dtype),
        "fe_in_proj": {"w": jnp.asarray(np.asarray(sd["feat_encoder.in_proj.weight"]).T, dtype),
                       "b": jnp.asarray(sd["feat_encoder.in_proj.bias"], dtype)},
        "fe_special": jnp.asarray(
            np.asarray(sd["feat_encoder.special_token"]).reshape(1, -1), dtype),
        "enc_to_lm": {"w": jnp.asarray(
            (np.asarray(sd["enc_to_lm_proj.weight"]) * fe_norm).T, dtype)},
        "cond_proj": {"w": jnp.asarray(
            np.asarray(sd["feat_decoder.estimator.cond_proj.weight"]).T, dtype),
            "b": jnp.asarray(sd["feat_decoder.estimator.cond_proj.bias"], dtype)},
        "est": llama_stack_from_state_dict(
            sd, "feat_decoder.estimator.decoder", cfg.estimator, dtype),
        "est_in_proj": {"w": jnp.asarray(
            np.asarray(sd["feat_decoder.estimator.in_proj.weight"]).T, dtype),
            "b": jnp.asarray(sd["feat_decoder.estimator.in_proj.bias"], dtype)},
        "est_out_proj": {"w": jnp.asarray(
            (np.asarray(sd["feat_decoder.estimator.out_proj.weight"]) * est_norm).T,
            dtype)},
    }
    # CFM time table: time_embeddings + time_mlp (+delta mlp) evaluated at
    # the sway schedule — computed with torch on CPU at load like the
    # reference precompute (Export_VoxCPM_ONNX.py:544-556)
    params.update(_cfm_tables(sd, cfg, dtype))

    from ..nn.rope import rope_table

    for name, c in (("rope", cfg.base), ("fe_rope", cfg.feat_encoder),
                    ("est_rope", cfg.estimator)):
        cos, sin = rope_table(c.max_seq_len, c.head_dim, c.rope_base)
        params[f"{name}_cos"] = jnp.asarray(cos, dtype)
        params[f"{name}_sin"] = jnp.asarray(sin, dtype)

    vae_params = vae_from_state_dict(sd, cfg.vae, dtype)
    return params, vae_params, cfg


def _sinusoidal_time_embed(t: np.ndarray, dim: int) -> np.ndarray:
    """Matching diffusers-style SinusoidalPosEmb used by the estimator."""
    half = dim // 2
    emb = np.log(10000.0) / (half - 1)
    emb = np.exp(np.arange(half) * -emb)
    emb = 1000.0 * t[:, None] * emb[None, :]
    return np.concatenate([np.sin(emb), np.cos(emb)], axis=-1)


def _mlp(x, w1, b1, w2, b2):
    h = x @ w1.T + b1
    h = h / (1.0 + np.exp(-h))
    return h @ w2.T + b2


def _cfm_tables(sd, cfg: VoxCPMConfig, dtype):
    from ..models.voxcpm import cfm_time_schedule

    ts, dts = cfm_time_schedule(cfg.cfm_steps, cfg.cfm_sway)
    est = "feat_decoder.estimator"
    d = cfg.estimator.hidden_size
    emb = _sinusoidal_time_embed(ts[:-1], d)
    t_tab = _mlp(emb, np.asarray(sd[f"{est}.time_mlp.0.weight"]),
                 np.asarray(sd[f"{est}.time_mlp.0.bias"]),
                 np.asarray(sd[f"{est}.time_mlp.2.weight"]),
                 np.asarray(sd[f"{est}.time_mlp.2.bias"]))
    if f"{est}.delta_time_mlp.0.weight" in sd:
        # mean_mode embeds the PER-STEP dt; otherwise a constant zero
        # time (Export_VoxCPM_ONNX.py:552-556) — either way a pure
        # function of the fixed schedule, folded into the table
        dt_in = dts if cfg.cfm_mean_mode else np.zeros(1, np.float32)
        demb = _sinusoidal_time_embed(np.asarray(dt_in, np.float32), d)
        dt_tab = _mlp(demb, np.asarray(sd[f"{est}.delta_time_mlp.0.weight"]),
                      np.asarray(sd[f"{est}.delta_time_mlp.0.bias"]),
                      np.asarray(sd[f"{est}.delta_time_mlp.2.weight"]),
                      np.asarray(sd[f"{est}.delta_time_mlp.2.bias"]))
        t_tab = t_tab + dt_tab
    return {"cfm_t_table": jnp.asarray(t_tab, dtype),
            "cfm_dt": jnp.asarray(dts, dtype)}
