"""Qwen3-TTS 12 Hz codec decoder + speaker encoder — TPU-native.

Behavioral contract from the reference TTS_DECODER wrapper
(/root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py:695-901) and the patched
tokenizer model (modeling_modified/modeling_qwen3_tts_tokenizer_v2.py):
  * split RVQ dequantize: group 0 through the semantic quantizer, groups
    1..15 summed through the acoustic quantizer; codebooks normalized as
    embedding_sum / clamp(cluster_usage) precomputed at load (:730-755).
    DELIBERATE DEVIATION: the reference modeling copy's SplitResidual-
    VectorQuantizer.decode slices codes[:, [1]] for the semantic group
    (tokenizer_v2.py:891-901) — dropping the talker's group-0 token the
    runtime places first (Export_Qwen_TTS_ONNX.py:2585-2595) and double-
    counting group 1; upstream uses codes[:, :1]. We implement the
    upstream slice (oracled against the reference's own rvq modules in
    tests/test_reference_oracle_families.py);
  * pre_conv (causal k3) -> input_proj -> 8-layer pre-transformer
    (RMSNorm-fused attention, full bidirectional attention, layer scales
    folded) -> output_proj (final norm folded);
  * upsample: per ratio [causal transposed conv (k=r, stride=r), causal
    ConvNeXt block (norm/gamma folded)] (:903-946);
  * decoder: causal conv(7) -> per rate [SnakeBeta -> causal transposed
    conv(2r, r) -> 3 residual units (SnakeBeta/conv7-dilated/SnakeBeta/
    conv1)] with dilations (1, 3, 9) -> SnakeBeta -> causal conv(7) ->
    clamp (:688-728, 948-976).

TPU re-design: feature-last layout, causal pads explicit, the whole decode
is one jitted program; the streaming variant reuses it at a fixed window
shape (runtime/qwen.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.snake import snake_beta
from ..nn.norm import layer_norm, rms_norm
from ..nn.rope import apply_rope, rope_table
from ..ops.conv import conv1d, conv_transpose1d

__all__ = ["QwenCodecDecoderConfig", "codec_decode", "init_decoder_params"]


@dataclass(frozen=True)
class QwenCodecDecoderConfig:
    """Defaults = qwen3-tts 12hz codec decoder; loader overrides from the
    checkpoint config."""

    num_quantizers: int = 16
    codebook_size: int = 2048
    codebook_dim: int = 512            # quantizer output dim
    rvq_dim: int = 256                 # codebook_dim // 2 internal dim
    latent_dim: int = 1024
    decoder_dim: int = 1536
    upsampling_ratios: tuple[int, ...] = (2,)      # pre-decoder upsample
    upsample_rates: tuple[int, ...] = (8, 5, 5, 5) # decoder conv stack (wip)
    # pre-transformer
    hidden_size: int = 1024
    num_heads: int = 16
    num_kv_heads: int = 16
    head_dim: int = 64
    ffn_dim: int = 4096
    num_layers: int = 8
    rms_eps: float = 1e-6
    rope_base: float = 10000.0
    max_seq_len: int = 4096

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.upsample_rates) * np.prod(self.upsampling_ratios))


def _causal_conv(x, w, b=None, dilation: int = 1, stride: int = 1,
                 groups: int = 1):
    """Left-pad (k_eff - stride) then VALID conv
    (CausalConvNet, tokenizer_v2.py:158-191)."""
    k = w.shape[0]
    k_eff = (k - 1) * dilation + 1
    pad = k_eff - stride
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    return conv1d(x, w, b, padding=0, dilation=dilation, stride=stride,
                  groups=groups)


def _causal_conv_transpose(x, w, b=None, stride: int = 1):
    """Transposed conv trimmed on the right by (k - stride)
    (CausalTransConvNet, tokenizer_v2.py:194-208)."""
    k = w.shape[0]
    y = conv_transpose1d(x, w, b, stride=stride, padding=0)
    trim = k - stride
    return y[:, : y.shape[1] - trim] if trim > 0 else y


def rvq_dequantize(params, codes: jax.Array) -> jax.Array:
    """codes (1, T, num_quantizers) -> (1, T, codebook_dim).

    Split RVQ (tokenizer_v2.py:891-901): group 0 -> semantic codebook +
    out-proj; groups 1.. -> acoustic codebooks (stacked (Q-1, bins, dim))
    summed, then acoustic out-proj. Codebooks are pre-normalized at load."""
    sem = params["sem_codebook"][codes[..., 0]]               # (1, T, rvq)
    sem = jnp.matmul(sem, params["sem_out_proj"])             # (1, T, cb_dim)

    def add(acc, g):
        return acc + params["ac_codebooks"][g][codes[..., g + 1]], None

    n_ac = params["ac_codebooks"].shape[0]
    ac0 = params["ac_codebooks"][0][codes[..., 1]]
    ac, _ = jax.lax.scan(add, ac0, jnp.arange(1, n_ac))
    ac = jnp.matmul(ac, params["ac_out_proj"])
    return sem + ac


def _pre_transformer(params, x: jax.Array, cfg: QwenCodecDecoderConfig
                     ) -> jax.Array:
    """Full-attention (non-causal) transformer with fused norms/scales
    (reference TTS_DECODER forward :863-886)."""
    t = x.shape[1]
    rope_cos = params["rope_cos"][:t]
    rope_sin = params["rope_sin"][:t]
    x = jnp.matmul(x, params["input_proj"]["w"]) + params["input_proj"]["b"]
    for p in params["layers"]:
        h = rms_norm(x, eps=cfg.rms_eps)
        qkv = jnp.matmul(h, p["wqkv"])
        if "bqkv" in p:
            qkv = qkv + p["bqkv"]
        q_sz = cfg.num_heads * cfg.head_dim
        kv_sz = cfg.num_kv_heads * cfg.head_dim
        b, s, _ = h.shape
        q = qkv[..., :q_sz].reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = qkv[..., q_sz:q_sz + kv_sz].reshape(b, s, cfg.num_kv_heads,
                                                cfg.head_dim)
        v = qkv[..., q_sz + kv_sz:].reshape(b, s, cfg.num_kv_heads,
                                            cfg.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        from ..nn.attention import gqa_attention

        # no cache: k/v go straight to (B, KVH, T, D) attention layout
        out = gqa_attention(q, k.swapaxes(1, 2), v.swapaxes(1, 2),
                            None).reshape(b, s, -1)
        x = x + jnp.matmul(out, p["wo"])
        h = rms_norm(x, eps=cfg.rms_eps)
        gu = jnp.matmul(h, p["w_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + jnp.matmul(jax.nn.silu(gate) * up, p["w_down"])
    x = rms_norm(x, eps=cfg.rms_eps)   # final norm weight folded in out proj
    return jnp.matmul(x, params["output_proj"]["w"]) + params["output_proj"]["b"]


def _convnext_causal(x, p):
    """Causal ConvNeXt block, norm affine pre-folded into pw1 and gamma into
    pw2 at load (tokenizer_v2.py:241-296)."""
    r = x
    x = _causal_conv(x, p["dwconv"]["w"], p["dwconv"]["b"],
                     groups=x.shape[-1])
    x = layer_norm(x, eps=1e-6)
    x = jnp.matmul(x, p["pw1"]["w"]) + p["pw1"]["b"]
    x = jax.nn.gelu(x, approximate=True)
    x = jnp.matmul(x, p["pw2"]["w"]) + p["pw2"]["b"]
    return r + x


def _residual_unit(x, p, dilation: int):
    h = snake_beta(x, p["act1"]["alpha"], p["act1"]["beta_recip"])
    h = _causal_conv(h, p["conv1"]["w"], p["conv1"]["b"], dilation=dilation)
    h = snake_beta(h, p["act2"]["alpha"], p["act2"]["beta_recip"])
    h = _causal_conv(h, p["conv2"]["w"], p["conv2"]["b"])
    return x + h


def codec_decode(params, codes: jax.Array, cfg: QwenCodecDecoderConfig
                 ) -> jax.Array:
    """codes (1, T, num_quantizers) int32 -> waveform (1, T*total_upsample)
    float clamped to [-1, 1] (TTS_DECODER forward :848-901)."""
    h = rvq_dequantize(params, codes)                          # (1, T, cb)
    h = _causal_conv(h, params["pre_conv"]["w"], params["pre_conv"]["b"])
    h = _pre_transformer(params, h, cfg)
    for i in range(len(cfg.upsampling_ratios)):
        up = params["upsample"][i]
        h = _causal_conv_transpose(h, up["conv"]["w"], up["conv"]["b"],
                                   stride=cfg.upsampling_ratios[i])
        h = _convnext_causal(h, up["convnext"])
    w = _causal_conv(h, params["dec_pre"]["w"], params["dec_pre"]["b"])
    for i, rate in enumerate(cfg.upsample_rates):
        blk = params["dec_blocks"][i]
        w = snake_beta(w, blk["act"]["alpha"], blk["act"]["beta_recip"])
        w = _causal_conv_transpose(w, blk["up"]["w"], blk["up"]["b"],
                                   stride=rate)
        for j, dil in enumerate((1, 3, 9)):
            w = _residual_unit(w, blk["units"][j], dil)
    w = snake_beta(w, params["dec_post_act"]["alpha"],
                   params["dec_post_act"]["beta_recip"])
    w = _causal_conv(w, params["dec_post"]["w"], params["dec_post"]["b"])
    return jnp.clip(w[..., 0], -1.0, 1.0)


def init_decoder_params(cfg: QwenCodecDecoderConfig, key: jax.Array,
                        dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4096))

    def mat(*shape, s=0.02):
        return jax.random.normal(next(keys), shape, dtype) * s

    def conv_p(k, cin, cout):
        return {"w": mat(k, cin, cout), "b": jnp.zeros((cout,), dtype)}

    def act_p(c):
        return {"alpha": jnp.ones((c,), dtype),
                "beta_recip": jnp.ones((c,), dtype)}

    scale = cfg.head_dim ** -0.25
    layers = []
    for _ in range(cfg.num_layers):
        wq = mat(cfg.hidden_size, cfg.num_heads * cfg.head_dim) * scale
        wk = mat(cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim) * scale
        wv = mat(cfg.hidden_size, cfg.num_kv_heads * cfg.head_dim)
        layers.append({
            "wqkv": jnp.concatenate([wq, wk, wv], axis=-1),
            "wo": mat(cfg.num_heads * cfg.head_dim, cfg.hidden_size),
            "w_gate_up": mat(cfg.hidden_size, 2 * cfg.ffn_dim),
            "w_down": mat(cfg.ffn_dim, cfg.hidden_size),
        })
    rope_cos, rope_sin = rope_table(cfg.max_seq_len, cfg.head_dim,
                                    cfg.rope_base)

    d0 = cfg.decoder_dim
    dec_blocks = []
    for i, r in enumerate(cfg.upsample_rates):
        cin = d0 // (2 ** i)
        cout = d0 // (2 ** (i + 1))
        dec_blocks.append({
            "act": act_p(cin),
            "up": conv_p(2 * r, cin, cout),
            "units": [
                {"act1": act_p(cout), "conv1": conv_p(7, cout, cout),
                 "act2": act_p(cout), "conv2": conv_p(1, cout, cout)}
                for _ in range(3)
            ],
        })
    out_dim = d0 // (2 ** len(cfg.upsample_rates))
    n_ac = cfg.num_quantizers - 1
    return {
        "sem_codebook": mat(cfg.codebook_size, cfg.rvq_dim),
        "sem_out_proj": mat(cfg.rvq_dim, cfg.codebook_dim),
        "ac_codebooks": mat(n_ac, cfg.codebook_size, cfg.rvq_dim),
        "ac_out_proj": mat(cfg.rvq_dim, cfg.codebook_dim),
        "pre_conv": conv_p(3, cfg.codebook_dim, cfg.latent_dim),
        "input_proj": {"w": mat(cfg.latent_dim, cfg.hidden_size),
                       "b": jnp.zeros((cfg.hidden_size,), dtype)},
        "layers": layers,
        "output_proj": {"w": mat(cfg.hidden_size, cfg.latent_dim),
                        "b": jnp.zeros((cfg.latent_dim,), dtype)},
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
        "upsample": [
            {"conv": conv_p(r, cfg.latent_dim, cfg.latent_dim),
             "convnext": {
                 "dwconv": conv_p(7, 1, cfg.latent_dim),
                 "pw1": {"w": mat(cfg.latent_dim, 4 * cfg.latent_dim),
                         "b": jnp.zeros((4 * cfg.latent_dim,), dtype)},
                 "pw2": {"w": mat(4 * cfg.latent_dim, cfg.latent_dim),
                         "b": jnp.zeros((cfg.latent_dim,), dtype)},
             }}
            for r in cfg.upsampling_ratios
        ],
        "dec_pre": conv_p(7, cfg.latent_dim, d0),
        "dec_blocks": dec_blocks,
        "dec_post_act": act_p(out_dim),
        "dec_post": conv_p(7, out_dim, 1),
    }
