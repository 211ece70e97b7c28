"""NeMo NanoCodec decoder (FSQ dequantize + causal HiFiGAN) — TPU-native.

Behavioral contract from the reference NEMO_CODEC wrapper
(/root/reference/Kani_TTS/Export_Kani_TTS.py:474-564) and the patched NeMo
AudioCodecModel decode path (modeling_modified/audio_codec.py:274-351):
  * token ids -> per-codebook indices (subtract codebook base offsets) ->
    vectorized FSQ dequantization via (codes // base) % levels, scaled to
    [-1, 1] -> (T, groups*dims) features;
  * causal HiFiGAN: pre_conv -> per stage [activation -> causal transposed
    conv upsample -> residual layer (mean of kernel-size branches, each a
    chain of dilated residual blocks)] -> post activation -> post conv ->
    clamp. Weight norm is collapsed at load (weights/loaders.py).

TPU re-design: feature-last (B, T, C) layout; causal padding as explicit
left-pad + VALID conv so XLA sees static shapes; the int16 x32767 scale is
folded into post_conv at load like the reference (Export_Kani_TTS.py:524-526).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.snake import snake
from ..ops.conv import conv1d, conv_transpose1d

__all__ = ["NanoCodecConfig", "fsq_dequantize", "hifigan_decode", "init_params"]


@dataclass(frozen=True)
class NanoCodecConfig:
    """Defaults = nvidia/nemo-nano-codec-22khz-0.6kbps-12.5fps
    (4 FSQ groups x 4 dims, levels [9,8,8,7]); loader overrides from the
    .nemo config yaml."""

    num_groups: int = 4                       # codebooks per frame
    dims_per_group: int = 4
    levels: tuple[int, ...] = (9, 8, 8, 7)    # FSQ levels per dim
    codebook_size: int = 4032                 # prod(levels)
    base_channels: int = 864
    up_sample_rates: tuple[int, ...] = (7, 7, 6, 6)
    kernel_sizes: tuple[int, ...] = (3, 7, 11)
    dilations: tuple[int, ...] = (1, 3, 5)
    pre_kernel: int = 7
    post_kernel: int = 3
    activation: str = "half_snake"            # 'snake' | 'half_snake' | 'lrelu'
    lrelu_slope: float = 0.1
    sample_rate: int = 22050

    @property
    def input_dim(self) -> int:
        return self.num_groups * self.dims_per_group

    @property
    def total_upsample(self) -> int:
        return int(np.prod(self.up_sample_rates))


# --------------------------------------------------------------------------
# FSQ

def fsq_dequantize(codes: jax.Array, cfg: NanoCodecConfig) -> jax.Array:
    """codes: (B, T, num_groups) int32 per-codebook indices (already offset-
    subtracted) -> (B, T, num_groups*dims) float in [-1, 1].

    Vectorized per-dim decode (Export_Kani_TTS.py:500-538):
      nonneg_d = (code // prod(levels[:d])) % levels[d]
      value_d  = nonneg_d / scale_d - offset_d/scale_d,
    scale_d = offset_d = levels[d] // 2 (the reference's fsq_scale/offset
    [4, 4, 4, 3] for levels [9, 8, 8, 7] — asymmetric for even levels).
    """
    levels = np.asarray(cfg.levels, np.int32)
    base = np.concatenate([[1], np.cumprod(levels[:-1])]).astype(np.int32)
    half = (levels // 2).astype(np.float32)
    codes = codes[..., None]                                   # (B, T, G, 1)
    nonneg = (codes // base) % levels                          # (B, T, G, D)
    out = nonneg.astype(jnp.float32) / half - 1.0
    b, t = codes.shape[:2]
    return out.reshape(b, t, cfg.input_dim)


def tokens_to_codes(save_ids: jax.Array, cfg: NanoCodecConfig,
                    audio_tokens_start: int) -> jax.Array:
    """(B, T*G) flat LM token ids -> (B, T, G) per-codebook indices
    (Export_Kani_TTS.py:496-533: reshape to frames then subtract the
    per-codebook base offset)."""
    b = save_ids.shape[0]
    codes = save_ids.reshape(b, -1, cfg.num_groups)
    offsets = (jnp.arange(cfg.num_groups, dtype=jnp.int32) * cfg.codebook_size
               + audio_tokens_start)
    return codes - offsets


# --------------------------------------------------------------------------
# Causal HiFiGAN decoder

def _act(x: jax.Array, p, cfg: NanoCodecConfig) -> jax.Array:
    if cfg.activation == "snake":
        return snake(x, p["alpha"], p.get("alpha_recip"))
    if cfg.activation == "half_snake":
        half = x.shape[-1] // 2
        a = snake(x[..., :half], p["alpha"], p.get("alpha_recip"))
        b = jax.nn.leaky_relu(x[..., half:], cfg.lrelu_slope)
        return jnp.concatenate([a, b], axis=-1)
    return jax.nn.leaky_relu(x, cfg.lrelu_slope)


def _causal_conv(x, w, b=None, dilation: int = 1) -> jax.Array:
    """Left-padded VALID conv: output[t] sees inputs <= t."""
    k = w.shape[0]
    pad = (k - 1) * dilation
    x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    return conv1d(x, w, b, padding=0, dilation=dilation)


def _causal_conv_transpose(x, w, b=None, stride: int = 1) -> jax.Array:
    """Causal transposed conv: full output trimmed to T*stride from the left
    (no future lookahead)."""
    y = conv_transpose1d(x, w, b, stride=stride, padding=0)
    return y[:, : x.shape[1] * stride]


def _res_block(x, p, kernel_size: int, cfg: NanoCodecConfig) -> jax.Array:
    """Chain of dilated residual units: x += conv_k1(act(conv_kd(act(x))))."""
    for j in range(len(cfg.dilations)):
        h = _act(x, p["acts1"][j], cfg)
        h = _causal_conv(h, p["convs1"][j]["w"], p["convs1"][j].get("b"),
                         dilation=cfg.dilations[j])
        h = _act(h, p["acts2"][j], cfg)
        h = _causal_conv(h, p["convs2"][j]["w"], p["convs2"][j].get("b"))
        x = x + h
    return x


def hifigan_decode(params, features: jax.Array, cfg: NanoCodecConfig
                   ) -> jax.Array:
    """features (B, T, input_dim) -> waveform (B, T * total_upsample) float.

    Callers fold the 32767 scale into post_conv at load; random-init output
    is clamped to [-1, 1] here for the un-folded path.
    """
    x = _causal_conv(features, params["pre_conv"]["w"], params["pre_conv"].get("b"))
    for i, rate in enumerate(cfg.up_sample_rates):
        x = _act(x, params["stage_acts"][i], cfg)
        x = _causal_conv_transpose(x, params["ups"][i]["w"],
                                   params["ups"][i].get("b"), stride=rate)
        blocks = params["res_layers"][i]
        acc = None
        for j, k in enumerate(cfg.kernel_sizes):
            r = _res_block(x, blocks[j], k, cfg)
            acc = r if acc is None else acc + r
        x = acc / len(cfg.kernel_sizes)
    x = _act(x, params["post_act"], cfg)
    x = _causal_conv(x, params["post_conv"]["w"], params["post_conv"].get("b"))
    return x[..., 0]


def init_params(cfg: NanoCodecConfig, key: jax.Array, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4096))

    def conv_p(k, cin, cout):
        return {"w": jax.random.normal(next(keys), (k, cin, cout), dtype) * 0.02,
                "b": jnp.zeros((cout,), dtype)}

    def act_p(c):
        n = c // 2 if cfg.activation == "half_snake" else c
        return {"alpha": jnp.ones((n,), dtype),
                "alpha_recip": jnp.ones((n,), dtype)}

    ch = [cfg.base_channels // (2 ** i) for i in range(len(cfg.up_sample_rates) + 1)]
    params = {
        "pre_conv": conv_p(cfg.pre_kernel, cfg.input_dim, ch[0]),
        "stage_acts": [act_p(ch[i]) for i in range(len(cfg.up_sample_rates))],
        "ups": [
            conv_p(2 * r, ch[i], ch[i + 1])
            for i, r in enumerate(cfg.up_sample_rates)
        ],
        "res_layers": [
            [
                {
                    "acts1": [act_p(ch[i + 1]) for _ in cfg.dilations],
                    "convs1": [conv_p(k, ch[i + 1], ch[i + 1]) for _ in cfg.dilations],
                    "acts2": [act_p(ch[i + 1]) for _ in cfg.dilations],
                    "convs2": [conv_p(k, ch[i + 1], ch[i + 1]) for _ in cfg.dilations],
                }
                for k in cfg.kernel_sizes
            ]
            for i in range(len(cfg.up_sample_rates))
        ],
        "post_act": act_p(ch[-1]),
        "post_conv": conv_p(cfg.post_kernel, ch[-1], 1),
    }
    return params
