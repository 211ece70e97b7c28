"""IndexTTS-1.5 checkpoint loaders (gpt.pth + bigvgan.pth + config.yaml).

Consumes the upstream artifacts the reference loads through
indextts.infer.IndexTTS (/root/reference/IndexTTS/Export_IndexTTS.py:321-330)
and applies its export-time folds at load:
  * GPT-2 c_attn split into q/k/v with the d^-0.25 scale folded into q and k
    (Export_IndexTTS.py:252-266);
  * conformer attention q/k/pos/bias_u/bias_v scaled by d^-0.25 and reshaped
    to per-head (H, D, d) layout (:94-129);
  * perceiver to_q/to_k scaled, to_kv split (:166-175 fuse block);
  * ECAPA BatchNorm folded to (scale, shift) from running stats;
  * conv weights transposed to WIO feature-last layout.
"""
from __future__ import annotations

import os
from typing import Mapping

import numpy as np

import jax.numpy as jnp

from ..models.bigvgan import BigVGANConfig
from ..models.indextts import IndexTTSConfig

__all__ = [
    "load_indextts",
    "indextts_gpt_from_state_dict",
    "indextts_conformer_from_state_dict",
    "indextts_perceiver_from_state_dict",
    "indextts_ecapa_from_state_dict",
]


def _t(w):
    return np.asarray(w).T


def _conv_w(w):
    """(out, in, k) -> (k, in, out)."""
    return np.transpose(np.asarray(w), (2, 1, 0))


def _heads(w, heads, head_dim):
    """(H*d, in) torch linear -> (H, in, d) per-head layout."""
    return np.asarray(w).reshape(heads, head_dim, -1).transpose(0, 2, 1)


def indextts_gpt_from_state_dict(sd: Mapping[str, np.ndarray],
                                 cfg: IndexTTSConfig, dtype=jnp.float32):
    """UnifiedVoice state dict (gpt.*, *_embedding, final_norm, mel_head)
    -> models/indextts.py gpt pytree."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "indextts-gpt")
    scale = cfg.gpt_head_dim ** -0.25
    d = cfg.gpt_dim

    def ln(pre):
        return {"w": jnp.asarray(sd[f"{pre}.weight"], dtype),
                "b": jnp.asarray(sd[f"{pre}.bias"], dtype)}

    layers = []
    for i in range(cfg.gpt_layers):
        pre = f"gpt.h.{i}"
        c_attn_w = np.asarray(sd[f"{pre}.attn.c_attn.weight"])  # (in, 3d) GPT2 Conv1D
        c_attn_b = np.asarray(sd[f"{pre}.attn.c_attn.bias"])
        if c_attn_w.shape[0] == 3 * d:                          # plain Linear layout
            c_attn_w = c_attn_w.T
        w = c_attn_w.copy()
        b = c_attn_b.copy()
        w[:, : 2 * d] *= scale                                  # q and k columns
        b[: 2 * d] *= scale
        c_proj_w = np.asarray(sd[f"{pre}.attn.c_proj.weight"])
        if c_proj_w.shape[0] == d and c_proj_w.shape[1] == d:
            pass                                                # GPT2 Conv1D (in, out)
        fc_w = np.asarray(sd[f"{pre}.mlp.c_fc.weight"])
        pj_w = np.asarray(sd[f"{pre}.mlp.c_proj.weight"])
        layers.append({
            "ln1": ln(f"{pre}.ln_1"),
            "wqkv": jnp.asarray(w, dtype),
            "bqkv": jnp.asarray(b, dtype),
            "wo": jnp.asarray(c_proj_w, dtype),
            "bo": jnp.asarray(sd[f"{pre}.attn.c_proj.bias"], dtype),
            "ln2": ln(f"{pre}.ln_2"),
            "fc": {"w": jnp.asarray(fc_w, dtype),
                   "b": jnp.asarray(sd[f"{pre}.mlp.c_fc.bias"], dtype)},
            "proj": {"w": jnp.asarray(pj_w, dtype),
                     "b": jnp.asarray(sd[f"{pre}.mlp.c_proj.bias"], dtype)},
        })
    return {
        "text_embed": jnp.asarray(sd["text_embedding.weight"], dtype),
        "text_pos": jnp.asarray(sd["text_pos_embedding.emb.weight"], dtype),
        "mel_embed": jnp.asarray(sd["mel_embedding.weight"], dtype),
        "mel_pos": jnp.asarray(sd["mel_pos_embedding.emb.weight"], dtype),
        "layers": layers,
        "ln_f": ln("gpt.ln_f"),
        "final_norm": ln("final_norm"),
        "lm_head": jnp.asarray(_t(sd["mel_head.weight"]), dtype),
        "lm_head_b": jnp.asarray(sd.get("mel_head.bias",
                                        np.zeros(cfg.num_mel_codes)), dtype),
    }


def indextts_conformer_from_state_dict(sd: Mapping[str, np.ndarray],
                                       cfg: IndexTTSConfig,
                                       dtype=jnp.float32):
    """conditioning_encoder.* keys -> conformer pytree (scales folded)."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "indextts-conformer")
    h, d = cfg.enc_heads, cfg.enc_dim
    hd = d // h
    scale = hd ** -0.25
    p = "conditioning_encoder"

    def ln(pre, c=d):
        return {"w": jnp.asarray(sd[f"{pre}.weight"], dtype),
                "b": jnp.asarray(sd[f"{pre}.bias"], dtype)}

    # conv2d subsampling + out linear with xscale folded (reference :84-85)
    xscale = float(d) ** 0.5
    layers = []
    for i in range(cfg.enc_layers):
        pre = f"{p}.encoders.{i}"
        a = f"{pre}.self_attn"
        layers.append({
            "norm_mha": ln(f"{pre}.norm_mha"),
            "attn": {
                "wq": jnp.asarray(_heads(np.asarray(sd[f"{a}.linear_q.weight"]) * scale, h, hd), dtype),
                "bq": jnp.asarray((np.asarray(sd[f"{a}.linear_q.bias"]) * scale).reshape(h, 1, hd), dtype),
                "wk": jnp.asarray(_heads(np.asarray(sd[f"{a}.linear_k.weight"]) * scale, h, hd), dtype),
                "bk": jnp.asarray((np.asarray(sd[f"{a}.linear_k.bias"]) * scale).reshape(h, 1, hd), dtype),
                "wv": jnp.asarray(_heads(sd[f"{a}.linear_v.weight"], h, hd), dtype),
                "bv": jnp.asarray(np.asarray(sd[f"{a}.linear_v.bias"]).reshape(h, 1, hd), dtype),
                "wpos": jnp.asarray(_heads(np.asarray(sd[f"{a}.linear_pos.weight"]) * scale, h, hd), dtype),
                "bias_u": jnp.asarray((np.asarray(sd[f"{a}.pos_bias_u"]) * scale).reshape(h, 1, hd), dtype),
                "bias_v": jnp.asarray((np.asarray(sd[f"{a}.pos_bias_v"]) * scale).reshape(h, 1, hd), dtype),
                "wo": jnp.asarray(np.asarray(sd[f"{a}.linear_out.weight"]).reshape(d, h, hd).transpose(1, 2, 0), dtype),
                "bo": jnp.asarray(sd[f"{a}.linear_out.bias"], dtype),
            },
            "norm_conv": ln(f"{pre}.norm_conv"),
            "conv": {
                "pw1": {"w": jnp.asarray(_conv_w(sd[f"{pre}.conv_module.pointwise_conv1.weight"])[0], dtype),
                        "b": jnp.asarray(sd[f"{pre}.conv_module.pointwise_conv1.bias"], dtype)},
                "dw": {"w": jnp.asarray(_conv_w(sd[f"{pre}.conv_module.depthwise_conv.weight"]), dtype),
                       "b": jnp.asarray(sd[f"{pre}.conv_module.depthwise_conv.bias"], dtype)},
                "norm": ln(f"{pre}.conv_module.norm"),
                "pw2": {"w": jnp.asarray(_conv_w(sd[f"{pre}.conv_module.pointwise_conv2.weight"])[0], dtype),
                        "b": jnp.asarray(sd[f"{pre}.conv_module.pointwise_conv2.bias"], dtype)},
            },
            "norm_ff": ln(f"{pre}.norm_ff"),
            "ff1": {"w": jnp.asarray(_t(sd[f"{pre}.feed_forward.w_1.weight"]), dtype),
                    "b": jnp.asarray(sd[f"{pre}.feed_forward.w_1.bias"], dtype)},
            "ff2": {"w": jnp.asarray(_t(sd[f"{pre}.feed_forward.w_2.weight"]), dtype),
                    "b": jnp.asarray(sd[f"{pre}.feed_forward.w_2.bias"], dtype)},
            "norm_final": ln(f"{pre}.norm_final"),
        })
    out_w = np.asarray(sd[f"{p}.embed.out.0.weight"]).T * xscale
    out_b = np.asarray(sd[f"{p}.embed.out.0.bias"]) * xscale
    return {
        "sub_convs": [
            {"w": jnp.asarray(sd[f"{p}.embed.conv.0.weight"], dtype),
             "b": jnp.asarray(sd[f"{p}.embed.conv.0.bias"], dtype)},
            {"w": jnp.asarray(sd[f"{p}.embed.conv.2.weight"], dtype),
             "b": jnp.asarray(sd[f"{p}.embed.conv.2.bias"], dtype)},
        ],
        "out": {"w": jnp.asarray(out_w, dtype), "b": jnp.asarray(out_b, dtype)},
        # RelPositionalEncoding table is deterministic — rebuilt like the
        # reference keeps pe[:, :max] (:78); callers regenerate if absent
        "pos_enc": jnp.asarray(_rel_pos_table(d, 4096), dtype),
        "layers": layers,
        "after_norm": ln(f"{p}.after_norm"),
    }


def _rel_pos_table(d: int, max_len: int) -> np.ndarray:
    """ESPnet (legacy) positional encoding table."""
    pe = np.zeros((max_len, d), np.float64)
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d, 2, dtype=np.float64) * -(np.log(10000.0) / d))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(np.float32)


def indextts_perceiver_from_state_dict(sd: Mapping[str, np.ndarray],
                                       cfg: IndexTTSConfig,
                                       dtype=jnp.float32):
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "indextts-perceiver")
    h, hd = cfg.perceiver_heads, cfg.perceiver_dim_head
    scale = hd ** -0.25
    p = "perceiver_encoder"
    layers = []
    for i in range(2):
        pre = f"{p}.layers.{i}"
        to_q = np.asarray(sd[f"{pre}.0.to_q.weight"]) * scale
        to_kv = np.asarray(sd[f"{pre}.0.to_kv.weight"])
        inner = to_q.shape[0]
        to_k = to_kv[:inner] * scale
        to_v = to_kv[inner:]
        layers.append({
            "wq": jnp.asarray(_heads(to_q, h, hd), dtype),
            "wk": jnp.asarray(_heads(to_k, h, hd), dtype),
            "wv": jnp.asarray(_heads(to_v, h, hd), dtype),
            "wo": jnp.asarray(np.asarray(sd[f"{pre}.0.to_out.weight"])
                              .reshape(-1, h, hd).transpose(1, 2, 0), dtype),
            "ff_norm": {"w": jnp.asarray(sd[f"{pre}.1.0.weight"], dtype),
                        "b": jnp.asarray(sd[f"{pre}.1.0.bias"], dtype)},
            "ff1": {"w": jnp.asarray(_t(sd[f"{pre}.1.1.weight"]), dtype),
                    "b": jnp.asarray(sd[f"{pre}.1.1.bias"], dtype)},
            "ff2": {"w": jnp.asarray(_t(sd[f"{pre}.1.3.weight"]), dtype),
                    "b": jnp.asarray(sd[f"{pre}.1.3.bias"], dtype)},
        })
    return {
        "proj_context": {"w": jnp.asarray(_t(sd[f"{p}.proj_context.weight"]), dtype),
                         "b": jnp.asarray(sd[f"{p}.proj_context.bias"], dtype)},
        "latents": jnp.asarray(sd[f"{p}.latents"], dtype),
        "layers": layers,
        "norm": {"w": jnp.asarray(sd[f"{p}.norm.weight"], dtype),
                 "b": jnp.asarray(sd[f"{p}.norm.bias"], dtype)},
    }


def _bn_fold(sd, pre, dtype=jnp.float32, eps: float = 1e-5):
    """BatchNorm1d running stats -> per-channel (scale, shift)."""
    g = np.asarray(sd[f"{pre}.weight"])
    b = np.asarray(sd[f"{pre}.bias"])
    mean = np.asarray(sd[f"{pre}.running_mean"])
    var = np.asarray(sd[f"{pre}.running_var"])
    scale = g / np.sqrt(var + eps)
    return {"scale": jnp.asarray(scale, dtype),
            "shift": jnp.asarray(b - mean * scale, dtype)}


def indextts_ecapa_from_state_dict(sd: Mapping[str, np.ndarray],
                                   cfg: IndexTTSConfig, dtype=jnp.float32):
    """speaker_encoder.* (speechbrain ECAPA-TDNN layout) -> ecapa pytree."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "indextts-ecapa")
    p = "speaker_encoder"

    def tdnn(pre):
        return {
            "conv": {"w": jnp.asarray(_conv_w(sd[f"{pre}.conv.weight"]), dtype),
                     "b": jnp.asarray(sd[f"{pre}.conv.bias"], dtype)},
            "bn": _bn_fold(sd, f"{pre}.norm.norm", dtype),
        }

    se_blocks = []
    for i in (1, 2, 3):
        pre = f"{p}.blocks.{i}"
        sub = cfg.ecapa_channels // cfg.res2net_scale
        se_blocks.append({
            "tdnn1": tdnn(f"{pre}.tdnn1"),
            "res2net": {"blocks": [tdnn(f"{pre}.res2net_block.blocks.{j}")
                                   for j in range(cfg.res2net_scale - 1)]},
            "tdnn2": tdnn(f"{pre}.tdnn2"),
            "se": {
                "w1": jnp.asarray(_conv_w(sd[f"{pre}.se_block.conv1.weight"])[0], dtype),
                "b1": jnp.asarray(sd[f"{pre}.se_block.conv1.bias"], dtype),
                "w2": jnp.asarray(_conv_w(sd[f"{pre}.se_block.conv2.weight"])[0], dtype),
                "b2": jnp.asarray(sd[f"{pre}.se_block.conv2.bias"], dtype),
            },
        })
    return {
        "block0": tdnn(f"{p}.blocks.0"),
        "se_blocks": se_blocks,
        "mfa": tdnn(f"{p}.mfa"),
        "asp_tdnn": tdnn(f"{p}.asp.tdnn"),
        "asp_conv": {"w": jnp.asarray(_conv_w(sd[f"{p}.asp.conv.weight"])[0], dtype),
                     "b": jnp.asarray(sd[f"{p}.asp.conv.bias"], dtype)},
        "asp_bn": _bn_fold(sd, f"{p}.asp_bn", dtype),
        "fc": {"w": jnp.asarray(_conv_w(sd[f"{p}.fc.weight"])[0], dtype),
               "b": jnp.asarray(sd.get(f"{p}.fc.bias", np.zeros(cfg.speaker_embed_dim)), dtype)},
    }


def _bigvgan_config_from_yaml(path: str, cfg: IndexTTSConfig) -> BigVGANConfig:
    """Build the IndexTTS vocoder config from the checkpoint's config.yaml
    `bigvgan:` section — the same dict the reference BigVGAN reads as `h`
    (models.py:139-196, incl. `feat_upsample` at :145 and `resblock` at
    :152). Falls back to IndexTTS-1.5 defaults when the file is absent
    (this env ships no checkpoints)."""
    h = {}
    if os.path.exists(path):
        import yaml

        with open(path) as f:
            full = yaml.safe_load(f) or {}
        h = full.get("bigvgan", {}) or {}
    return BigVGANConfig(
        num_mels=cfg.gpt_dim,
        upsample_initial_channel=h.get("upsample_initial_channel", 1536),
        upsample_rates=tuple(h.get("upsample_rates", (4, 4, 2, 2, 2, 2))),
        upsample_kernel_sizes=tuple(
            h.get("upsample_kernel_sizes", (8, 8, 4, 4, 4, 4))),
        resblock_kernel_sizes=tuple(
            h.get("resblock_kernel_sizes", (3, 7, 11))),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in h.get(
                "resblock_dilation_sizes", ((1, 3, 5), (1, 3, 5), (1, 3, 5)))),
        activation=h.get("activation", "snakebeta"),
        snake_logscale=bool(h.get("snake_logscale", True)),
        use_bias_at_final=True,
        use_tanh_at_final=True,
        sample_rate=h.get("sampling_rate", 24000),
        resblock=str(h.get("resblock", "1")),
        feat_upsample=bool(h.get("feat_upsample", False)),
    )


def load_indextts(model_dir: str, cfg: IndexTTSConfig | None = None,
                  dtype=jnp.float32):
    """Load an IndexTTS-1.5 model dir (gpt.pth + bigvgan.pth) into the
    runtime/indextts.py params dict. BigVGAN generator weights reuse
    loaders.bigvgan_params_from_state_dict."""
    import torch

    from .loaders import bigvgan_params_from_state_dict

    cfg = cfg or IndexTTSConfig()
    gpt_sd = {k: v.numpy() for k, v in torch.load(
        os.path.join(model_dir, "gpt.pth"), map_location="cpu",
        weights_only=True).items() if hasattr(v, "numpy")}
    bv_sd = {k: v.numpy() for k, v in torch.load(
        os.path.join(model_dir, "bigvgan.pth"), map_location="cpu",
        weights_only=True).items() if hasattr(v, "numpy")}

    vcfg = _bigvgan_config_from_yaml(
        os.path.join(model_dir, "config.yaml"), cfg)
    gen_sd = {k: v for k, v in bv_sd.items()
              if not k.startswith(("speaker_encoder.", "cond_layer.", "conds."))}
    params = {
        "gpt": indextts_gpt_from_state_dict(gpt_sd, cfg, dtype),
        "conformer": indextts_conformer_from_state_dict(gpt_sd, cfg, dtype),
        "perceiver": indextts_perceiver_from_state_dict(gpt_sd, cfg, dtype),
        "ecapa": indextts_ecapa_from_state_dict(bv_sd, cfg, dtype),
        "bigvgan": bigvgan_params_from_state_dict(gen_sd, vcfg, dtype),
        "cond_layer": {
            "w": jnp.asarray(_conv_w(bv_sd["cond_layer.weight"])[0], dtype),
            "b": jnp.asarray(bv_sd["cond_layer.bias"], dtype)},
        "conds": [
            {"w": jnp.asarray(_conv_w(bv_sd[f"conds.{i}.weight"])[0], dtype),
             "b": jnp.asarray(bv_sd[f"conds.{i}.bias"], dtype)}
            for i in range(len(vcfg.upsample_rates))
        ],
    }
    return params, cfg, vcfg
