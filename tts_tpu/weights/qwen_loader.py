"""Qwen3-TTS checkpoint loader (HF safetensors dir).

Consumes the same checkpoint the reference loads via from_pretrained
(/root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py:1376) and applies its
export-time folds at load (:945-1023 talker, :1196-1254 predictor):
  * qkv fused, input RMSNorm absorbed into qkv;
  * q/k per-head norm weights scaled by d^-0.25 (we keep mean-based norms,
    so only the scale is folded — the reference's extra sqrt(d) compensates
    its sum-based norm);
  * gate/up fused with post-norm absorbed;
  * final norm folded into codec_head / the 15 stacked LM heads;
  * the 15 predictor LM heads stacked to (15, H, V) and the 15 group
    embedding tables to (15, V, H) — the fusion that removes the
    reference's per-graph overhead.
"""
from __future__ import annotations

import json
import os
from typing import Mapping

import numpy as np

import jax.numpy as jnp

from ..models.qwen_tts import (
    Qwen3StackConfig,
    QwenTTSConfig,
    make_suppress_bias,
)
from ..models.qwen_codec import QwenCodecDecoderConfig
from ..nn.rope import rope_table

__all__ = ["load_qwen_tts", "qwen3_stack_from_state_dict",
           "load_qwen_codec", "qwen_codec_from_state_dict",
           "load_qwen_encoder", "mimi_encoder_from_state_dict"]


def _hf_state_dict(model_dir: str) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    sd: dict[str, np.ndarray] = {}
    for f in sorted(os.listdir(model_dir)):
        if f.endswith(".safetensors"):
            sd.update(load_file(os.path.join(model_dir, f)))
    if not sd:
        raise FileNotFoundError(f"no safetensors in {model_dir}")
    return sd


def qwen3_stack_from_state_dict(sd: Mapping[str, np.ndarray], prefix: str,
                                cfg: Qwen3StackConfig, dtype=jnp.float32):
    """Map `{prefix}.layers.{i}.*` Qwen3 decoder weights with the folds."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, f"qwen3[{prefix}]")
    scale = cfg.head_dim ** -0.25
    layers = []
    for i in range(cfg.num_layers):
        p = f"{prefix}.layers.{i}"
        in_norm = np.asarray(sd[f"{p}.input_layernorm.weight"])[None, :]
        post_norm = np.asarray(sd[f"{p}.post_attention_layernorm.weight"])[None, :]
        wq = np.asarray(sd[f"{p}.self_attn.q_proj.weight"]) * in_norm
        wk = np.asarray(sd[f"{p}.self_attn.k_proj.weight"]) * in_norm
        wv = np.asarray(sd[f"{p}.self_attn.v_proj.weight"]) * in_norm
        layer = {
            "wqkv": jnp.asarray(np.concatenate([wq, wk, wv], axis=0).T, dtype),
            "q_norm": jnp.asarray(
                np.asarray(sd[f"{p}.self_attn.q_norm.weight"]) * scale, dtype),
            "k_norm": jnp.asarray(
                np.asarray(sd[f"{p}.self_attn.k_norm.weight"]) * scale, dtype),
            "wo": jnp.asarray(np.asarray(sd[f"{p}.self_attn.o_proj.weight"]).T,
                              dtype),
            "w_gate_up": jnp.asarray(np.concatenate(
                [np.asarray(sd[f"{p}.mlp.gate_proj.weight"]) * post_norm,
                 np.asarray(sd[f"{p}.mlp.up_proj.weight"]) * post_norm],
                axis=0).T, dtype),
            "w_down": jnp.asarray(
                np.asarray(sd[f"{p}.mlp.down_proj.weight"]).T, dtype),
        }
        if f"{p}.self_attn.q_proj.bias" in sd:
            layer["bqkv"] = jnp.asarray(np.concatenate(
                [sd[f"{p}.self_attn.q_proj.bias"],
                 sd[f"{p}.self_attn.k_proj.bias"],
                 sd[f"{p}.self_attn.v_proj.bias"]]), dtype)
        layers.append(layer)
    return {"layers": layers}


def qwen_config_from_json(model_dir: str) -> QwenTTSConfig:
    with open(os.path.join(model_dir, "config.json")) as f:
        c = json.load(f)
    tk = c.get("talker_config", c)
    pk = tk.get("code_predictor_config", {})

    def stack(cc, default_layers, max_seq):
        return Qwen3StackConfig(
            hidden_size=cc.get("hidden_size", 1024),
            num_heads=cc.get("num_attention_heads", 16),
            num_kv_heads=cc.get("num_key_value_heads", 8),
            head_dim=cc.get("head_dim",
                            cc.get("hidden_size", 1024)
                            // cc.get("num_attention_heads", 16)),
            ffn_dim=cc.get("intermediate_size", 3072),
            num_layers=cc.get("num_hidden_layers", default_layers),
            rms_eps=cc.get("rms_norm_eps", 1e-6),
            rope_base=cc.get("rope_theta", 1000000.0),
            max_seq_len=max_seq,
        )

    return QwenTTSConfig(
        talker=stack(tk, 28, 2048),
        predictor=stack(pk, 4, 40),
        codec_vocab=tk.get("vocab_size", 3072),
        group_vocab=pk.get("vocab_size", 2048),
        num_code_groups=pk.get("num_code_groups", 16),
        codec_eos_token_id=tk.get("codec_eos_token_id", 2150),
        codec_bos_id=tk.get("codec_bos_id", 2149),
        codec_pad_id=tk.get("codec_pad_id", 2148),
        codec_think_id=tk.get("codec_think_id", 2154),
        codec_think_bos_id=tk.get("codec_think_bos_id", 2155),
        codec_think_eos_id=tk.get("codec_think_eos_id", 2156),
        tts_bos_token_id=c.get("tts_bos_token_id", 151672),
        tts_eos_token_id=c.get("tts_eos_token_id", 151673),
        tts_pad_token_id=c.get("tts_pad_token_id", 151671),
        text_vocab=c.get("text_vocab_size", 151936),
        text_hidden=c.get("text_hidden_size", 2048),
    )


def load_qwen_tts(model_dir: str, cfg: QwenTTSConfig | None = None,
                  dtype=jnp.float32):
    """Returns (params, cfg) for runtime/qwen.QwenTTSPipeline (talker +
    predictor; the codec decoder loads separately)."""
    sd = _hf_state_dict(model_dir)
    cfg = cfg or qwen_config_from_json(model_dir)
    t, p = cfg.talker, cfg.predictor

    tp = "talker.model"
    pp = "talker.code_predictor.model"
    talker_norm = np.asarray(sd[f"{tp}.norm.weight"])[None, :]
    pred_norm = np.asarray(sd[f"{pp}.norm.weight"])[None, :]

    lm_heads = np.stack([
        np.asarray(sd[f"talker.code_predictor.lm_head.{g}.weight"])
        * pred_norm for g in range(cfg.num_code_groups - 1)
    ]).transpose(0, 2, 1)                                      # (15, H, V)
    group_embeds = np.stack([
        np.asarray(sd[f"{pp}.codec_embedding.{g}.weight"])
        for g in range(cfg.num_code_groups - 1)
    ])                                                         # (15, V, tH)

    rope_cos, rope_sin = rope_table(t.max_seq_len, t.head_dim, t.rope_base)
    p_cos, p_sin = rope_table(p.max_seq_len, p.head_dim, p.rope_base)

    params = {
        "talker": qwen3_stack_from_state_dict(sd, tp, t, dtype),
        "codec_head": jnp.asarray(
            (np.asarray(sd["talker.codec_head.weight"]) * talker_norm).T, dtype),
        "suppress_bias": jnp.asarray(
            make_suppress_bias(cfg.codec_vocab, cfg.codec_eos_token_id), dtype),
        "talker_codec_embed": jnp.asarray(
            sd[f"{tp}.codec_embedding.weight"], dtype),
        "text_embed": jnp.asarray(sd[f"{tp}.text_embedding.weight"], dtype),
        "text_proj_w": jnp.asarray(
            np.asarray(sd["talker.text_projection.weight"]).T, dtype),
        "text_proj_b": jnp.asarray(
            sd.get("talker.text_projection.bias",
                   np.zeros(t.hidden_size)), dtype),
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
        "predictor": qwen3_stack_from_state_dict(sd, pp, p, dtype),
        "small_to_mtp": jnp.asarray(np.asarray(
            sd["talker.code_predictor.small_to_mtp_projection.weight"]).T,
            dtype),
        "lm_heads": jnp.asarray(lm_heads, dtype),
        "group_embeds": jnp.asarray(group_embeds, dtype),
        "pred_rope_cos": jnp.asarray(p_cos, dtype),
        "pred_rope_sin": jnp.asarray(p_sin, dtype),
    }
    return params, cfg


# ---------------------------------------------------------------------------
# Codec decoder (speech_tokenizer.model.decoder.* in the same HF checkpoint)

def _cdconv(sd, pre, dtype, transposed=False):
    """CausalConvNet/CausalTransConvNet `{pre}.conv` -> WIO layout."""
    w = np.asarray(sd[f"{pre}.conv.weight"])
    w = np.transpose(w, (2, 0, 1) if transposed else (2, 1, 0))
    p = {"w": jnp.asarray(w, dtype)}
    if f"{pre}.conv.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{pre}.conv.bias"], dtype)
    else:
        p["b"] = jnp.zeros((w.shape[-1 if not transposed else 1],), dtype)
    return p


def _snake_beta(sd, pre, dtype):
    """SnakeBeta stores log-scale alpha/beta; precompute exp(alpha) and
    1/(exp(beta)+1e-9) (tokenizer_v2.py:658-663)."""
    alpha = np.asarray(sd[f"{pre}.alpha"]).astype(np.float64)
    beta = np.asarray(sd[f"{pre}.beta"]).astype(np.float64)
    return {"alpha": jnp.asarray(np.exp(alpha), dtype),
            "beta_recip": jnp.asarray(1.0 / (np.exp(beta) + 1e-9), dtype)}


def _codebook(sd, pre) -> np.ndarray:
    """EuclideanCodebook: embedding = embedding_sum / clamp(cluster_usage)
    (tokenizer_v2.py:730-755)."""
    s = np.asarray(sd[f"{pre}.embedding_sum"], np.float64)
    u = np.asarray(sd[f"{pre}.cluster_usage"], np.float64)
    return s / np.clip(u, 1e-5, None)[:, None]


def qwen_codec_from_state_dict(sd: Mapping[str, np.ndarray],
                               cfg: QwenCodecDecoderConfig,
                               dtype=jnp.float32,
                               prefix: str = "speech_tokenizer.model.decoder"):
    """Map the Qwen3-TTS tokenizer-v2 decoder onto models/qwen_codec.py's
    pytree with the reference export's load-time folds
    (Export_Qwen_TTS_ONNX.py:766-846): QKV fused with d^-0.25, input/post
    RMSNorm weights into qkv / gate_up, per-layer scales into wo / w_down,
    final norm into output_proj, ConvNeXt LayerNorm affine into pw1 and
    gamma into pw2. SnakeBeta exp/recip precomputed; RVQ codebooks
    normalized by cluster usage."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "qwen-codec")
    d = prefix
    scale = cfg.head_dim ** -0.25

    layers = []
    for i in range(cfg.num_layers):
        p = f"{d}.pre_transformer.layers.{i}"
        in_norm = np.asarray(sd[f"{p}.input_layernorm.weight"])[None, :]
        post_norm = np.asarray(
            sd[f"{p}.post_attention_layernorm.weight"])[None, :]
        attn_scale = np.asarray(
            sd[f"{p}.self_attn_layer_scale.scale"])[:, None]
        mlp_scale = np.asarray(sd[f"{p}.mlp_layer_scale.scale"])[:, None]
        wq = np.asarray(sd[f"{p}.self_attn.q_proj.weight"]) * in_norm * scale
        wk = np.asarray(sd[f"{p}.self_attn.k_proj.weight"]) * in_norm * scale
        wv = np.asarray(sd[f"{p}.self_attn.v_proj.weight"]) * in_norm
        layer = {
            "wqkv": jnp.asarray(np.concatenate([wq, wk, wv], axis=0).T, dtype),
            "wo": jnp.asarray(
                (np.asarray(sd[f"{p}.self_attn.o_proj.weight"]) * attn_scale
                 ).T, dtype),
            "w_gate_up": jnp.asarray(np.concatenate(
                [np.asarray(sd[f"{p}.mlp.gate_proj.weight"]) * post_norm,
                 np.asarray(sd[f"{p}.mlp.up_proj.weight"]) * post_norm],
                axis=0).T, dtype),
            "w_down": jnp.asarray(
                (np.asarray(sd[f"{p}.mlp.down_proj.weight"]) * mlp_scale).T,
                dtype),
        }
        if f"{p}.self_attn.q_proj.bias" in sd:
            layer["bqkv"] = jnp.asarray(np.concatenate(
                [np.asarray(sd[f"{p}.self_attn.q_proj.bias"]) * scale,
                 np.asarray(sd[f"{p}.self_attn.k_proj.bias"]) * scale,
                 np.asarray(sd[f"{p}.self_attn.v_proj.bias"])]), dtype)
        layers.append(layer)

    final_norm = np.asarray(sd[f"{d}.pre_transformer.norm.weight"])[None, :]
    out_proj_w = np.asarray(sd[f"{d}.pre_transformer.output_proj.weight"]) \
        * final_norm

    n_ac = cfg.num_quantizers - 1
    ac_codebooks = np.stack([
        _codebook(sd, f"{d}.quantizer.rvq_rest.vq.layers.{g}._codebook")
        for g in range(n_ac)
    ])

    def upsample_block(i):
        up = _cdconv(sd, f"{d}.upsample.{i}.0", dtype, transposed=True)
        c = f"{d}.upsample.{i}.1"
        nw = np.asarray(sd[f"{c}.norm.weight"])[None, :]
        nb = np.asarray(sd[f"{c}.norm.bias"])
        gamma = np.asarray(sd[f"{c}.gamma"])[:, None]
        pw1_w = np.asarray(sd[f"{c}.pwconv1.weight"])
        pw1_b = np.asarray(sd[f"{c}.pwconv1.bias"]) + pw1_w @ nb
        pw1_w = pw1_w * nw
        pw2_w = np.asarray(sd[f"{c}.pwconv2.weight"]) * gamma
        pw2_b = np.asarray(sd[f"{c}.pwconv2.bias"]) * gamma[:, 0]
        return {"conv": up, "convnext": {
            "dwconv": _cdconv(sd, f"{c}.dwconv", dtype),
            "pw1": {"w": jnp.asarray(pw1_w.T, dtype),
                    "b": jnp.asarray(pw1_b, dtype)},
            "pw2": {"w": jnp.asarray(pw2_w.T, dtype),
                    "b": jnp.asarray(pw2_b, dtype)},
        }}

    n_rates = len(cfg.upsample_rates)

    def dec_block(i):
        b = f"{d}.decoder.{i + 1}.block"
        return {
            "act": _snake_beta(sd, f"{b}.0", dtype),
            "up": _cdconv(sd, f"{b}.1", dtype, transposed=True),
            "units": [
                {"act1": _snake_beta(sd, f"{b}.{2 + j}.act1", dtype),
                 "conv1": _cdconv(sd, f"{b}.{2 + j}.conv1", dtype),
                 "act2": _snake_beta(sd, f"{b}.{2 + j}.act2", dtype),
                 "conv2": _cdconv(sd, f"{b}.{2 + j}.conv2", dtype)}
                for j in range(3)
            ],
        }

    rope_cos, rope_sin = rope_table(cfg.max_seq_len, cfg.head_dim,
                                    cfg.rope_base)
    sem_out = np.asarray(
        sd[f"{d}.quantizer.rvq_first.output_proj.weight"])[:, :, 0]
    ac_out = np.asarray(
        sd[f"{d}.quantizer.rvq_rest.output_proj.weight"])[:, :, 0]
    return {
        "sem_codebook": jnp.asarray(_codebook(
            sd, f"{d}.quantizer.rvq_first.vq.layers.0._codebook"), dtype),
        "sem_out_proj": jnp.asarray(sem_out.T, dtype),
        "ac_codebooks": jnp.asarray(ac_codebooks, dtype),
        "ac_out_proj": jnp.asarray(ac_out.T, dtype),
        "pre_conv": _cdconv(sd, f"{d}.pre_conv", dtype),
        "input_proj": {
            "w": jnp.asarray(np.asarray(
                sd[f"{d}.pre_transformer.input_proj.weight"]).T, dtype),
            "b": jnp.asarray(
                sd[f"{d}.pre_transformer.input_proj.bias"], dtype)},
        "layers": layers,
        "output_proj": {
            "w": jnp.asarray(out_proj_w.T, dtype),
            "b": jnp.asarray(
                sd[f"{d}.pre_transformer.output_proj.bias"], dtype)},
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
        "upsample": [upsample_block(i)
                     for i in range(len(cfg.upsampling_ratios))],
        "dec_pre": _cdconv(sd, f"{d}.decoder.0", dtype),
        "dec_blocks": [dec_block(i) for i in range(n_rates)],
        "dec_post_act": _snake_beta(sd, f"{d}.decoder.{n_rates + 1}", dtype),
        "dec_post": _cdconv(sd, f"{d}.decoder.{n_rates + 2}", dtype),
    }


def load_qwen_codec(model_dir: str, cfg: QwenCodecDecoderConfig | None = None,
                    dtype=jnp.float32):
    """Load the codec decoder from the same HF checkpoint directory as
    load_qwen_tts. Returns (params, cfg)."""
    sd = _hf_state_dict(model_dir)
    cfg = cfg or QwenCodecDecoderConfig()
    return qwen_codec_from_state_dict(sd, cfg, dtype), cfg


# ---------------------------------------------------------------------------
# Mimi prompt encoder (speech_tokenizer.model.encoder.* — voice-clone path)

def _mimi_conv(sd, pre, dtype, bias=True):
    """MimiConv1d `{pre}.conv` (possibly weight-normed) -> WIO layout."""
    for gk, vk in ((f"{pre}.conv.weight_g", f"{pre}.conv.weight_v"),
                   (f"{pre}.conv.parametrizations.weight.original0",
                    f"{pre}.conv.parametrizations.weight.original1")):
        if gk in sd:
            g, v = np.asarray(sd[gk], np.float64), np.asarray(sd[vk],
                                                              np.float64)
            w = g * v / np.linalg.norm(v.reshape(v.shape[0], -1), axis=1
                                       ).reshape(-1, 1, 1)
            break
    else:
        w = np.asarray(sd[f"{pre}.conv.weight"])
    p = {"w": jnp.asarray(np.transpose(w, (2, 1, 0)), dtype)}
    if bias and f"{pre}.conv.bias" in sd:
        p["b"] = jnp.asarray(sd[f"{pre}.conv.bias"], dtype)
    else:
        p["b"] = jnp.zeros((w.shape[0],), dtype)
    return p


def _mimi_codebook(sd, pre) -> np.ndarray:
    """MimiEuclideanCodebook: embed = embed_sum / cluster_usage
    (modeling_mimi.py:1190-1203)."""
    s = np.asarray(sd[f"{pre}.embed_sum"], np.float64)
    u = np.asarray(sd[f"{pre}.cluster_usage"], np.float64)
    return s / np.clip(u, 1e-5, None)[:, None]


def mimi_encoder_from_state_dict(sd: Mapping[str, np.ndarray],
                                 cfg, dtype=jnp.float32,
                                 prefix: str = "speech_tokenizer.model.encoder"):
    """Map the HF Mimi encoder (SEANet convs + transformer + downsample +
    split RVQ) onto models/qwen_encoder.py's pytree. Transformer LayerNorm
    affines and per-layer scales are folded into the adjacent linears
    (the export keeps them separate — Export_Qwen_TTS_ONNX.py:555-581 —
    but folding is numerically identical); QKV fused with d^-0.25."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "qwen-encoder")
    from ..models.qwen_encoder import MimiEncoderConfig  # noqa: F401
    from ..nn.rope import rope_table

    e = f"{prefix}.encoder"
    scale = cfg.head_dim ** -0.25

    # SEANet layer indices follow the constructor (modeling_mimi.py:444-473)
    idx = 0
    pre_conv = _mimi_conv(sd, f"{e}.layers.{idx}", dtype)
    idx += 1
    blocks = []
    for ratio in reversed(cfg.upsampling_ratios):
        res = []
        for _ in range(cfg.num_residual_layers):
            res.append({
                "c1": _mimi_conv(sd, f"{e}.layers.{idx}.block.1", dtype),
                "c2": _mimi_conv(sd, f"{e}.layers.{idx}.block.3", dtype),
            })
            idx += 1
        idx += 1                                   # nn.ELU slot
        blocks.append({"res": res,
                       "down": _mimi_conv(sd, f"{e}.layers.{idx}", dtype)})
        idx += 1
    idx += 1                                       # final nn.ELU slot
    post_conv = _mimi_conv(sd, f"{e}.layers.{idx}", dtype)

    t = f"{prefix}.encoder_transformer"
    layers = []
    for i in range(cfg.num_layers):
        p = f"{t}.layers.{i}"
        ln_w = np.asarray(sd[f"{p}.input_layernorm.weight"])[None, :]
        ln_b = np.asarray(sd[f"{p}.input_layernorm.bias"])
        pn_w = np.asarray(sd[f"{p}.post_attention_layernorm.weight"])[None, :]
        pn_b = np.asarray(sd[f"{p}.post_attention_layernorm.bias"])
        a_sc = np.asarray(sd[f"{p}.self_attn_layer_scale.scale"])[:, None]
        m_sc = np.asarray(sd[f"{p}.mlp_layer_scale.scale"])[:, None]
        wq = np.asarray(sd[f"{p}.self_attn.q_proj.weight"])
        wk = np.asarray(sd[f"{p}.self_attn.k_proj.weight"])
        wv = np.asarray(sd[f"{p}.self_attn.v_proj.weight"])
        fc1 = np.asarray(sd[f"{p}.mlp.fc1.weight"])
        # fold LN affine: y = W(x_hat * ln_w + ln_b) = (W*ln_w) x_hat + W@ln_b
        qkv_w = np.concatenate([wq * ln_w * scale, wk * ln_w * scale,
                                wv * ln_w], axis=0)
        qkv_b = np.concatenate([wq @ ln_b * scale, wk @ ln_b * scale,
                                wv @ ln_b])
        layers.append({
            "wqkv": jnp.asarray(qkv_w.T, dtype),
            "bqkv": jnp.asarray(qkv_b, dtype),
            "wo": jnp.asarray(
                (np.asarray(sd[f"{p}.self_attn.o_proj.weight"]) * a_sc).T,
                dtype),
            "bo": jnp.zeros((cfg.hidden_size,), dtype),
            "fc1": {"w": jnp.asarray((fc1 * pn_w).T, dtype),
                    "b": jnp.asarray(fc1 @ pn_b, dtype)},
            "fc2": {"w": jnp.asarray(
                (np.asarray(sd[f"{p}.mlp.fc2.weight"]) * m_sc).T, dtype),
                "b": jnp.zeros((cfg.hidden_size,), dtype)},
        })

    q = f"{prefix}.quantizer"
    sem = f"{q}.semantic_residual_vector_quantizer"
    ac = f"{q}.acoustic_residual_vector_quantizer"
    n_ac = cfg.num_quantizers - 1
    rope_cos, rope_sin = rope_table(cfg.max_seq_len, cfg.head_dim,
                                    cfg.rope_base)
    return {
        "pre": pre_conv,
        "blocks": blocks,
        "post": post_conv,
        "layers": layers,
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
        "downsample": _mimi_conv(sd, f"{prefix}.downsample", dtype),
        "sem_in_proj": jnp.asarray(np.asarray(
            sd[f"{sem}.input_proj.weight"])[:, :, 0].T, dtype),
        "sem_codebook": jnp.asarray(_mimi_codebook(
            sd, f"{sem}.layers.0.codebook"), dtype),
        "ac_in_proj": jnp.asarray(np.asarray(
            sd[f"{ac}.input_proj.weight"])[:, :, 0].T, dtype),
        "ac_codebooks": jnp.asarray(np.stack([
            _mimi_codebook(sd, f"{ac}.layers.{g}.codebook")
            for g in range(n_ac)]), dtype),
    }


def load_qwen_encoder(model_dir: str, cfg=None, dtype=jnp.float32):
    """Load the Mimi prompt encoder from the HF checkpoint. Returns
    (params, cfg)."""
    from ..models.qwen_encoder import MimiEncoderConfig

    sd = _hf_state_dict(model_dir)
    cfg = cfg or MimiEncoderConfig()
    return mimi_encoder_from_state_dict(sd, cfg, dtype), cfg


def qwen_speaker_from_state_dict(sd: Mapping[str, np.ndarray],
                                 prefix: str = "speaker_encoder",
                                 res2net_scale: int = 8,
                                 n_se_blocks: int = 3,
                                 dtype=jnp.float32):
    """Qwen3TTSSpeakerEncoder weights (modeling_qwen3_tts.py:291-371) ->
    the models/indextts.ecapa_speaker_encoder pytree, Qwen variant.

    The Qwen encoder is the BatchNorm-FREE, reflect-padded ECAPA flavor
    (TimeDelayNetBlock :227-248 is Conv1d+ReLU only), so no "bn"/"asp_bn"
    entries are emitted — the forward keys its variant off that; call
    with reflect_pad=True, std_clip=None. Oracled against the reference
    module in tests/test_reference_oracle_qwen.py."""
    from .loaders import CheckpointDict

    sd = CheckpointDict.wrap(sd, "qwen-speaker")

    def cw(key):
        return np.transpose(np.asarray(sd[key]), (2, 1, 0))

    def tdnn(pre):
        return {"conv": {"w": jnp.asarray(cw(f"{pre}.conv.weight"), dtype),
                         "b": jnp.asarray(sd[f"{pre}.conv.bias"], dtype)}}

    se_blocks = []
    for i in range(1, 1 + n_se_blocks):
        pre = f"{prefix}.blocks.{i}"
        se_blocks.append({
            "tdnn1": tdnn(f"{pre}.tdnn1"),
            "res2net": {"blocks": [
                tdnn(f"{pre}.res2net_block.blocks.{j}")
                for j in range(res2net_scale - 1)]},
            "tdnn2": tdnn(f"{pre}.tdnn2"),
            "se": {
                "w1": jnp.asarray(cw(f"{pre}.se_block.conv1.weight")[0], dtype),
                "b1": jnp.asarray(sd[f"{pre}.se_block.conv1.bias"], dtype),
                "w2": jnp.asarray(cw(f"{pre}.se_block.conv2.weight")[0], dtype),
                "b2": jnp.asarray(sd[f"{pre}.se_block.conv2.bias"], dtype),
            },
        })
    return {
        "block0": tdnn(f"{prefix}.blocks.0"),
        "se_blocks": se_blocks,
        "mfa": tdnn(f"{prefix}.mfa"),
        "asp_tdnn": tdnn(f"{prefix}.asp.tdnn"),
        "asp_conv": {"w": jnp.asarray(cw(f"{prefix}.asp.conv.weight")[0], dtype),
                     "b": jnp.asarray(sd[f"{prefix}.asp.conv.bias"], dtype)},
        "fc": {"w": jnp.asarray(cw(f"{prefix}.fc.weight")[0], dtype),
               "b": jnp.asarray(sd[f"{prefix}.fc.bias"], dtype)},
    }
