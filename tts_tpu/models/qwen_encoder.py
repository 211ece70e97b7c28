"""Qwen3-TTS reference-audio encoder (Mimi SEANet conv stack + transformer +
split-RVQ encode) and mel speaker encoder — the voice_clone prompt path.

Behavioral contract from the reference TTS_ENCODER wrapper
(/root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py:415-589) and the patched
Mimi copy (modeling_modified/modeling_mimi.py):
  * resample to 24 kHz -> causal SEANet encoder: conv(7) -> per ratio
    (reversed upsampling_ratios) [resnet block (ELU/conv3-dilated/ELU/conv1)
    -> ELU -> strided conv(2r)] -> ELU -> conv(last) (:444-487);
  * 8-layer transformer with LayerNorm affines folded into qkv/fc1 and
    layer scales folded into o_proj/fc2 at load (:461-527);
  * downsample conv -> split RVQ encode: nearest-codebook search via the
    ||y||^2 - 2<x,y> trick (:1183-1241), semantic quantizer first, then the
    acoustic quantizers on the residual;
  * log-mel (slaney fbank) -> ECAPA-style speaker encoder -> speaker_embed
    (:583-589; the ECAPA math is shared with models/indextts.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.norm import layer_norm
from ..nn.rope import apply_rope, rope_table
from ..ops.conv import conv1d

__all__ = ["MimiEncoderConfig", "mimi_encode", "rvq_encode",
           "init_encoder_params"]


@dataclass(frozen=True)
class MimiEncoderConfig:
    """Defaults per HF Mimi / qwen3-tts speech tokenizer config."""

    num_filters: int = 64
    upsampling_ratios: tuple[int, ...] = (8, 6, 5, 4)   # decode order
    num_residual_layers: int = 1
    dilation_growth_rate: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    compress: int = 2
    hidden_size: int = 512
    # transformer
    num_heads: int = 8
    head_dim: int = 64
    ffn_dim: int = 2048
    num_layers: int = 8
    rope_base: float = 10000.0
    max_seq_len: int = 8192
    # downsample + quantizer
    downsample_stride: int = 2
    rvq_dim: int = 256
    codebook_size: int = 2048
    num_quantizers: int = 16


def _causal_conv(x, w, b=None, stride: int = 1, dilation: int = 1,
                 pad_mode: str = "constant"):
    """Mimi causal conv: left-pad (k_eff - stride) (modeling_mimi.py:204-341
    padding-cache semantics at stream start). The SEANet convs zero-pad
    (config.pad_mode='constant'); the frame-rate downsample conv pads
    'replicate' (modeling_mimi.py:1437-1445) = jnp 'edge'."""
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad = max(k_eff - stride, 0)
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)),
                mode="edge" if pad_mode == "replicate" else "constant")
    return conv1d(x, w, b, padding=0, stride=stride, dilation=dilation)


def mimi_encode(params, audio: jax.Array, cfg: MimiEncoderConfig) -> jax.Array:
    """audio (B, N) float 24 kHz -> embeddings (B, T, hidden) after the conv
    stack, transformer, and downsample (pre-quantizer)."""
    x = audio[..., None]
    x = _causal_conv(x, params["pre"]["w"], params["pre"]["b"])
    for bi, blk in enumerate(params["blocks"]):
        for j, unit in enumerate(blk["res"]):
            r = x
            h = jax.nn.elu(x)
            # dilation pattern is static: growth_rate ** unit_index
            h = _causal_conv(h, unit["c1"]["w"], unit["c1"]["b"],
                             dilation=cfg.dilation_growth_rate ** j)
            h = jax.nn.elu(h)
            h = _causal_conv(h, unit["c2"]["w"], unit["c2"]["b"])
            x = r + h
        x = jax.nn.elu(x)
        stride = tuple(reversed(cfg.upsampling_ratios))[bi]
        x = _causal_conv(x, blk["down"]["w"], blk["down"]["b"], stride=stride)
    x = jax.nn.elu(x)
    x = _causal_conv(x, params["post"]["w"], params["post"]["b"])

    # transformer (full attention; norms/scales pre-folded at load)
    t = x.shape[1]
    rope_cos = params["rope_cos"][:t]
    rope_sin = params["rope_sin"][:t]
    h = cfg.num_heads
    d = cfg.head_dim
    for p in params["layers"]:
        r = x
        n = layer_norm(x, eps=1e-5)
        qkv = jnp.matmul(n, p["wqkv"]) + p["bqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b_, s_, _ = n.shape
        q = apply_rope(q.reshape(b_, s_, h, d), rope_cos, rope_sin)
        k = apply_rope(k.reshape(b_, s_, h, d), rope_cos, rope_sin)
        v = v.reshape(b_, s_, h, d)
        from ..nn.attention import gqa_attention

        out = gqa_attention(q, k.swapaxes(1, 2), v.swapaxes(1, 2),
                            None).reshape(b_, s_, -1)
        x = r + (jnp.matmul(out, p["wo"]) + p["bo"])
        r = x
        n = layer_norm(x, eps=1e-5)
        # EXACT gelu: the export's GELU->tanh swap rebinds nn.GELU
        # instances only; Mimi's MLP activation is ACT2FN['gelu'] =
        # GELUActivation (erf form), which it never touches
        # (modeling_mimi.py:577-593, Export_Qwen_TTS_ONNX.py:536-543)
        hdn = jax.nn.gelu(jnp.matmul(n, p["fc1"]["w"]) + p["fc1"]["b"],
                          approximate=False)
        x = r + (jnp.matmul(hdn, p["fc2"]["w"]) + p["fc2"]["b"])

    return _causal_conv(x, params["downsample"]["w"],
                        params["downsample"].get("b"),
                        stride=cfg.downsample_stride,
                        pad_mode="replicate")


def _nearest_code(x: jax.Array, embed: jax.Array) -> jax.Array:
    """argmin_y ||x - y||^2 via ||y||^2 - 2<x, y> (modeling_mimi.py:1221-1241).
    x (..., D), embed (V, D) -> (...,) int32."""
    dot = jnp.matmul(x, embed.T)
    norm = jnp.sum(embed * embed, axis=-1)
    return jnp.argmin(norm[None, None] - 2.0 * dot, axis=-1).astype(jnp.int32)


def rvq_encode(params, emb: jax.Array, cfg: MimiEncoderConfig,
               num_quantizers: int | None = None) -> jax.Array:
    """emb (B, T, hidden) -> codes (B, T, Q): split RVQ — semantic codebook
    first (own projection), acoustic residual chain after."""
    nq = num_quantizers or cfg.num_quantizers
    # semantic
    s = jnp.matmul(emb, params["sem_in_proj"])                 # (B, T, rvq)
    sem_code = _nearest_code(s, params["sem_codebook"])        # (B, T)
    # acoustic residual chain over stacked codebooks (nq-1, V, rvq)
    a = jnp.matmul(emb, params["ac_in_proj"])

    def step(residual, g):
        cb = params["ac_codebooks"][g]
        code = _nearest_code(residual, cb)
        residual = residual - cb[code]
        return residual, code

    _, ac_codes = jax.lax.scan(step, a, jnp.arange(nq - 1))
    codes = jnp.concatenate(
        [sem_code[None], ac_codes], axis=0)                    # (Q, B, T)
    return jnp.transpose(codes, (1, 2, 0))                     # (B, T, Q)


def init_encoder_params(cfg: MimiEncoderConfig, key: jax.Array,
                        dtype=jnp.float32):
    keys = iter(jax.random.split(key, 1024))

    def mat(*shape, s=0.02):
        return jax.random.normal(next(keys), shape, dtype) * s

    def conv_p(k, cin, cout):
        return {"w": mat(k, cin, cout, s=0.1), "b": jnp.zeros((cout,), dtype)}

    blocks = []
    ch = cfg.num_filters
    for ratio in reversed(cfg.upsampling_ratios):
        res = []
        hidden = ch // cfg.compress
        for j in range(cfg.num_residual_layers):
            res.append({
                "c1": conv_p(cfg.residual_kernel_size, ch, hidden),
                "c2": conv_p(1, hidden, ch),
            })
        blocks.append({"res": res, "down": conv_p(2 * ratio, ch, 2 * ch)})
        ch *= 2
    inner = cfg.num_heads * cfg.head_dim
    layers = []
    scale = cfg.head_dim ** -0.25
    for _ in range(cfg.num_layers):
        wq = mat(cfg.hidden_size, inner) * scale
        wk = mat(cfg.hidden_size, inner) * scale
        wv = mat(cfg.hidden_size, inner)
        layers.append({
            "wqkv": jnp.concatenate([wq, wk, wv], axis=-1),
            "bqkv": jnp.zeros((3 * inner,), dtype),
            "wo": mat(inner, cfg.hidden_size),
            "bo": jnp.zeros((cfg.hidden_size,), dtype),
            "fc1": {"w": mat(cfg.hidden_size, cfg.ffn_dim),
                    "b": jnp.zeros((cfg.ffn_dim,), dtype)},
            "fc2": {"w": mat(cfg.ffn_dim, cfg.hidden_size),
                    "b": jnp.zeros((cfg.hidden_size,), dtype)},
        })
    rope_cos, rope_sin = rope_table(cfg.max_seq_len, cfg.head_dim,
                                    cfg.rope_base)
    return {
        "pre": conv_p(cfg.kernel_size, 1, cfg.num_filters),
        "blocks": blocks,
        "post": conv_p(cfg.last_kernel_size, ch, cfg.hidden_size),
        "layers": layers,
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
        "downsample": conv_p(2 * cfg.downsample_stride, cfg.hidden_size,
                             cfg.hidden_size),
        "sem_in_proj": mat(cfg.hidden_size, cfg.rvq_dim),
        "sem_codebook": mat(cfg.codebook_size, cfg.rvq_dim, s=1.0),
        "ac_in_proj": mat(cfg.hidden_size, cfg.rvq_dim),
        "ac_codebooks": mat(cfg.num_quantizers - 1, cfg.codebook_size,
                            cfg.rvq_dim, s=1.0),
    }
