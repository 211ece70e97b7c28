"""BigVGAN vocoder — mel (B, T, n_mels) -> waveform, TPU-native.

Behavioral contract from the reference
(/root/reference/BigVGAN/modeling_modified/bigvgan.py:242-410 and the
BIGVGAN export wrapper Export_BigVGAN.py:37-49): conv_pre(7) -> per stage
[transposed-conv upsample -> mean of `num_kernels` AMP resblocks] ->
anti-aliased snake post-activation -> conv_post(7) -> tanh (or clamp) ->
int16 scale. AMPBlock1 = 3 dilation branches of
x + c2(a2(c1(a1(x)))) with anti-aliased snake/snakebeta activations.

TPU re-design decisions:
  * feature-last (B, T, C) everywhere — channels ride MXU/VPU lanes;
  * weight-norm is collapsed at load time (weights/loaders.py), never at
    runtime;
  * the upstream CUDA "alias-free activation" kernel is the
    AliasFreeResample pair around a pointwise snake (audio/filters.py);
  * the whole generator is one jitted program — XLA fuses the snake chains
    into the surrounding convs.

Weights pytree (see `init_params` for the authoritative shape spec).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.filters import AliasFreeResample
from ..audio.snake import snake, snake_beta
from ..ops.conv import conv1d, conv_transpose1d

__all__ = ["BigVGANConfig", "bigvgan_apply", "init_params",
           "linear_upsample_4x"]


@dataclass(frozen=True)
class BigVGANConfig:
    """Defaults = bigvgan_v2_24khz_100band_256x (the reference's benchmark
    model, BigVGAN/Export_BigVGAN.py:18)."""

    num_mels: int = 100
    upsample_initial_channel: int = 1536
    upsample_rates: tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5),
    )
    activation: str = "snakebeta"          # 'snake' | 'snakebeta'
    snake_logscale: bool = True
    use_bias_at_final: bool = False        # v2 models: no bias, no tanh
    use_tanh_at_final: bool = False
    sample_rate: int = 24000
    resblock: str = "1"                    # '1' = AMPBlock1, '2' = AMPBlock2
    # IndexTTS variant: 4x linear interpolation of the input latents before
    # conv_pre (reference IndexTTS/modeling_modified/models.py:213-218)
    feat_upsample: bool = False

    @property
    def num_kernels(self) -> int:
        return len(self.resblock_kernel_sizes)

    @property
    def stage_channels(self) -> tuple[int, ...]:
        return tuple(
            self.upsample_initial_channel // (2 ** (i + 1))
            for i in range(len(self.upsample_rates))
        )

    @property
    def total_upsample(self) -> int:
        """Samples per input frame, including the feat_upsample 4x."""
        return int(np.prod(self.upsample_rates)) * (4 if self.feat_upsample else 1)


def _act(x, p, cfg: BigVGANConfig, resample: AliasFreeResample):
    """Anti-aliased snake: 2x upsample -> snake/snakebeta -> 2x downsample,
    computed in polyphase space (filters.alias_free_act) so the whole
    activation is one fused elementwise pass — the unfused chain measured
    87% of the generator's runtime (benchmarks/bigvgan_profile.py).

    Snake params stored post-transform: alpha = exp(a) and beta_recip =
    1/exp(b) when snake_logscale (the reference precomputes these at export).
    """
    if cfg.activation == "snakebeta":
        act = lambda u: snake_beta(u, p["alpha"], p["beta_recip"])
    else:
        act = lambda u: snake(u, p["alpha"], p["alpha_recip"])
    return resample.alias_free_act(x, act)


def _amp_block(x, p, kernel_size: int, dilations, cfg, resample):
    """AMPBlock1: per dilation d: x += conv_k_d(act(conv_k_1(act(x))))."""
    pad1 = [(kernel_size * d - d) // 2 for d in dilations]
    pad2 = (kernel_size - 1) // 2
    for j, d in enumerate(dilations):
        xt = _act(x, p["acts1"][j], cfg, resample)
        xt = conv1d(xt, p["convs1"][j]["w"], p["convs1"][j]["b"],
                    padding=pad1[j], dilation=d)
        xt = _act(xt, p["acts2"][j], cfg, resample)
        xt = conv1d(xt, p["convs2"][j]["w"], p["convs2"][j]["b"], padding=pad2)
        x = x + xt
    return x


def _amp_block2(x, p, kernel_size: int, dilations, cfg, resample):
    """AMPBlock2: per dilation d: x += conv_k_d(act(x)) — one conv per
    dilation branch (reference BigVGAN/modeling_modified/bigvgan.py:149-219,
    IndexTTS/modeling_modified/models.py:83-128)."""
    for j, d in enumerate(dilations):
        xt = _act(x, p["acts"][j], cfg, resample)
        xt = conv1d(xt, p["convs"][j]["w"], p["convs"][j]["b"],
                    padding=(kernel_size * d - d) // 2, dilation=d)
        x = x + xt
    return x


def linear_upsample_4x(x: jax.Array) -> jax.Array:
    """4x linear interpolation along axis 1 of (B, T, C), exactly matching
    torch.nn.functional.interpolate(scale_factor=4, mode='linear',
    align_corners=False): output index 4t+r samples input coordinate
    t + (r+0.5)/4 - 0.5, boundary-clamped. The per-offset blend weights are
    static, so this is four fused axpys + an interleave — no gather."""
    xp = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)   # x[t-1], edge-clamped
    xn = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)   # x[t+1], edge-clamped
    y = jnp.stack([
        0.375 * xp + 0.625 * x,
        0.125 * xp + 0.875 * x,
        0.875 * x + 0.125 * xn,
        0.625 * x + 0.375 * xn,
    ], axis=2)                                            # (B, T, 4, C)
    return y.reshape(x.shape[0], 4 * x.shape[1], x.shape[2])


def _amp_block_kernel(x, p, kernel_size: int, dilations, cfg,
                      interpret: bool = False):
    """AMPBlock1 through the fused VMEM kernel (ops/bigvgan_stage.py):
    the whole act->conv->act->conv branch chain runs on-chip per tile —
    one HBM read + write per resblock instead of ~13 passes."""
    from ..ops.bigvgan_stage import amp_block_fused

    st = lambda key, sub: jnp.stack([br[sub] for br in p[key]])
    rk = "beta_recip" if cfg.activation == "snakebeta" else "alpha_recip"
    return amp_block_fused(
        x, st("convs1", "w"), st("convs1", "b"),
        st("convs2", "w"), st("convs2", "b"),
        st("acts1", "alpha"), st("acts1", rk),
        st("acts2", "alpha"), st("acts2", rk),
        k=kernel_size, dils=tuple(dilations), interpret=interpret)


def bigvgan_apply(params, mel: jax.Array, cfg: BigVGANConfig,
                  conds=None, cond_embed: jax.Array | None = None,
                  fused: bool | None = None) -> jax.Array:
    """mel: (B, T, num_mels) -> waveform (B, T * prod(upsample_rates)).

    Output in [-1, 1] float; callers scale to int16 (the reference folds
    x32767+clamp into the graph, Export_BigVGAN.py:46-48).

    Speaker conditioning (IndexTTS variant, reference
    IndexTTS/modeling_modified/models.py:226-234): `cond_embed` (B, 1, C0)
    adds after conv_pre; `conds[i]` (B, 1, C_i) adds after each upsample.

    `fused`: route AMPBlock1 stages through the VMEM resblock kernel
    where its layout gate admits them (default: auto on TPU).
    """
    if fused is None:
        fused = jax.default_backend() == "tpu"
    x = bigvgan_pre(params, mel, cfg, cond_embed=cond_embed)
    for i in range(len(cfg.upsample_rates)):
        x = bigvgan_stage(params, x, i, cfg, fused=fused,
                          cond=None if conds is None else conds[i])
    return bigvgan_post(params, x, cfg)


def bigvgan_pre(params, mel: jax.Array, cfg: BigVGANConfig,
                cond_embed: jax.Array | None = None) -> jax.Array:
    """feat-upsample (IndexTTS variant) + conv_pre + speaker embed."""
    if cfg.feat_upsample:
        mel = linear_upsample_4x(mel)
    x = conv1d(mel, params["conv_pre"]["w"], params["conv_pre"]["b"], padding=3)
    if cond_embed is not None:
        x = x + cond_embed
    return x


def bigvgan_stage(params, x: jax.Array, i: int, cfg: BigVGANConfig,
                  fused: bool = False, cond: jax.Array | None = None
                  ) -> jax.Array:
    """One upsample stage: transposed conv -> num_kernels AMP blocks
    averaged. Split out so callers can jit per-stage: the 2026-08-20
    remote compile helper grinds superlinearly on the COMPOSED ~70-conv
    generator graph (>40 min, any length) while a single stage compiles
    in ~9 s — `BigVGANVocoder.benchmark(staged=True)` and degraded
    environments run the stage programs back to back (same math;
    CPU-equality-tested against the monolith)."""
    from ..ops.bigvgan_stage import fusable_stage

    resample = AliasFreeResample(2)
    block_fn = _amp_block if cfg.resblock == "1" else _amp_block2
    rate, ks = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
    up = params["ups"][i]
    x = conv_transpose1d(x, up["w"], up["b"], stride=rate,
                         padding=(ks - rate) // 2)
    if cond is not None:
        x = x + cond
    use_kernel = (fused and cfg.resblock == "1"
                  and fusable_stage(x.shape[-1], x.shape[1], x.dtype))
    acc = None
    for j, (k, dil) in enumerate(
        zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
    ):
        p = params["resblocks"][i * cfg.num_kernels + j]
        r = (_amp_block_kernel(x, p, k, dil, cfg) if use_kernel
             else block_fn(x, p, k, dil, cfg, resample))
        acc = r if acc is None else acc + r
    return acc * (1.0 / cfg.num_kernels)


def bigvgan_post(params, x: jax.Array, cfg: BigVGANConfig) -> jax.Array:
    """post activation + conv_post + tanh/clamp."""
    resample = AliasFreeResample(2)
    x = _act(x, params["act_post"], cfg, resample)
    x = conv1d(x, params["conv_post"]["w"], params["conv_post"].get("b"), padding=3)
    x = x[..., 0]
    if cfg.use_tanh_at_final:
        return jnp.tanh(x)
    return jnp.clip(x, -1.0, 1.0)


def init_params(cfg: BigVGANConfig, key: jax.Array, dtype=jnp.float32):
    """Random-init pytree with the authoritative shapes (test/bench use;
    real weights come from weights/loaders.load_bigvgan)."""
    keys = iter(jax.random.split(key, 512))

    def conv_p(k, cin, cout, bias=True):
        p = {"w": jax.random.normal(next(keys), (k, cin, cout), dtype) * 0.02}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def act_p(c):
        if cfg.activation == "snakebeta":
            return {"alpha": jnp.ones((c,), dtype), "beta_recip": jnp.ones((c,), dtype)}
        return {"alpha": jnp.ones((c,), dtype), "alpha_recip": jnp.ones((c,), dtype)}

    c0 = cfg.upsample_initial_channel
    params = {
        "conv_pre": conv_p(7, cfg.num_mels, c0),
        "ups": [],
        "resblocks": [],
    }
    ch_in = c0
    for i, (rate, ks) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch_out = cfg.stage_channels[i]
        params["ups"].append(conv_p(ks, ch_in, ch_out))
        for k, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            if cfg.resblock == "2":
                params["resblocks"].append(
                    {
                        "convs": [conv_p(k, ch_out, ch_out) for _ in dil],
                        "acts": [act_p(ch_out) for _ in dil],
                    }
                )
            else:
                params["resblocks"].append(
                    {
                        "convs1": [conv_p(k, ch_out, ch_out) for _ in dil],
                        "convs2": [conv_p(k, ch_out, ch_out) for _ in dil],
                        "acts1": [act_p(ch_out) for _ in dil],
                        "acts2": [act_p(ch_out) for _ in dil],
                    }
                )
        ch_in = ch_out
    params["act_post"] = act_p(ch_in)
    params["conv_post"] = conv_p(7, ch_in, 1, bias=cfg.use_bias_at_final)
    return params
