"""Vocos mel-vocoder (ConvNeXt backbone + ISTFT head) — TPU-native.

Behavioral contract from the reference's patched vocos
(/root/reference/F5_TTS/modeling_modified/vocos/models.py:26-85,
modules.py:8-52, heads.py:27-60): embed conv(7) -> LayerNorm -> N ConvNeXt
blocks (dwconv7 / LN / pw1 / GELU / pw2 with layer-scale gamma) -> final
LayerNorm -> linear head -> (exp-clamped magnitude, phase) -> ISTFT.

TPU re-design:
  * feature-last (B, T, C); pointwise convs are plain matmuls on the MXU;
  * gamma (layer-scale) is folded into pw2 at load time exactly as the
    reference does at export (Export_F5.py:400-402), so the block body has
    no extra multiply;
  * the reference replaces LayerNorm with an L2-norm approximation to ease
    ONNX graph shape; we keep the true LayerNorm (XLA fuses it) — closer to
    the upstream checkpoint's semantics;
  * the ISTFT runs through audio/stft.py's overlap-add matmul kernel.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..audio.stft import IstftKernel
from ..nn.norm import layer_norm
from ..ops.conv import conv1d

__all__ = ["VocosConfig", "vocos_decode", "vocos_backbone", "init_params"]


@dataclass(frozen=True)
class VocosConfig:
    """Defaults = charactr/vocos-mel-24khz (the F5 vocoder,
    Export_F5.py:24)."""

    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop: int = 256
    sample_rate: int = 24000


def _convnext_block(x: jax.Array, p) -> jax.Array:
    """dwconv(7) -> LN -> pw1 -> GELU -> pw2 (gamma pre-folded), residual."""
    r = x
    x = conv1d(x, p["dwconv"]["w"], p["dwconv"]["b"], padding=3,
               groups=x.shape[-1])
    x = layer_norm(x, p["norm"]["w"], p["norm"]["b"], eps=1e-6)
    x = jnp.matmul(x, p["pw1"]["w"]) + p["pw1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = jnp.matmul(x, p["pw2"]["w"]) + p["pw2"]["b"]
    return r + x


def vocos_backbone(params, mel: jax.Array) -> jax.Array:
    """mel (B, T, input_channels) -> hidden (B, T, dim)."""
    x = conv1d(mel, params["embed"]["w"], params["embed"]["b"], padding=3)
    x = layer_norm(x, params["norm"]["w"], params["norm"]["b"], eps=1e-6)
    for p in params["blocks"]:
        x = _convnext_block(x, p)
    return layer_norm(x, params["final_norm"]["w"], params["final_norm"]["b"],
                      eps=1e-6)


def vocos_decode(params, mel: jax.Array, cfg: VocosConfig) -> jax.Array:
    """mel (B, T, input_channels) -> waveform (B, (T-1)*hop), float [-1, 1]
    unclamped (callers clamp/scale — the reference clamps then scales to
    int16, Export_F5.py:203)."""
    mel = mel.astype(params["embed"]["w"].dtype)
    x = vocos_backbone(params, mel)
    spec = jnp.matmul(x, params["head"]["w"],
                      precision="highest") + params["head"]["b"]   # (B, T, n_fft+2)
    spec = jnp.swapaxes(spec, -1, -2).astype(jnp.float32)          # (B, n_fft+2, T)
    mag, phase = jnp.split(spec, 2, axis=-2)
    mag = jnp.clip(jnp.exp(mag), max=1e2)
    istft = IstftKernel(cfg.n_fft, cfg.hop, cfg.n_fft)
    return istft.from_mag_phase(mag, phase)


def init_params(cfg: VocosConfig, key: jax.Array, dtype=jnp.float32):
    """Random-init pytree (tests); real weights via weights/f5_loader.py."""
    keys = iter(jax.random.split(key, 128))

    def lin(cin, cout):
        return {"w": jax.random.normal(next(keys), (cin, cout), dtype) * 0.02,
                "b": jnp.zeros((cout,), dtype)}

    def conv(k, cin, cout, groups=1):
        return {"w": jax.random.normal(next(keys), (k, cin // groups, cout), dtype) * 0.02,
                "b": jnp.zeros((cout,), dtype)}

    def ln(c):
        return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    return {
        "embed": conv(7, cfg.input_channels, cfg.dim),
        "norm": ln(cfg.dim),
        "blocks": [
            {
                "dwconv": conv(7, cfg.dim, cfg.dim, groups=cfg.dim),
                "norm": ln(cfg.dim),
                "pw1": lin(cfg.dim, cfg.intermediate_dim),
                "pw2": lin(cfg.intermediate_dim, cfg.dim),
            }
            for _ in range(cfg.num_layers)
        ],
        "final_norm": ln(cfg.dim),
        "head": lin(cfg.dim, cfg.n_fft + 2),
    }
