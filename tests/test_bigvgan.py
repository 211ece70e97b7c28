"""BigVGAN generator: shape contract, finiteness, and component parity."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply, init_params

SMALL = BigVGANConfig(
    num_mels=8,
    upsample_initial_channel=32,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
)


def test_generator_shape_and_finite():
    params = init_params(SMALL, jax.random.key(0))
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 8)), jnp.float32)
    out = jax.jit(lambda p, m: bigvgan_apply(p, m, SMALL))(params, mel)
    assert out.shape == (1, 16 * 8)
    assert np.isfinite(np.asarray(out)).all()
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_generator_time_equivariance():
    """A vocoder is (approximately) shift-equivariant: shifting the input mel
    by one frame shifts the output by the upsample factor."""
    params = init_params(SMALL, jax.random.key(1))
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 24, 8)).astype(np.float32)
    fn = jax.jit(lambda m: bigvgan_apply(params, m, SMALL))
    y0 = np.asarray(fn(jnp.asarray(mel[:, :-1])))
    y1 = np.asarray(fn(jnp.asarray(mel[:, 1:])))
    up = SMALL.total_upsample
    # interior samples should match after shifting by `up`
    a = y0[0, 4 * up : -4 * up]
    b = y1[0, 3 * up : -5 * up]
    assert np.abs(a - b).max() < 1e-3


def test_tanh_vs_clamp_final():
    cfg_tanh = BigVGANConfig(
        **{**SMALL.__dict__, "use_tanh_at_final": True, "use_bias_at_final": True}
    )
    params = init_params(cfg_tanh, jax.random.key(2))
    mel = jnp.ones((1, 8, 8), jnp.float32) * 3.0
    out = np.asarray(bigvgan_apply(params, mel, cfg_tanh))
    assert np.abs(out).max() < 1.0  # tanh never saturates to exactly 1


# ---------------------------------------------------------------- AMPBlock2

SMALL2 = BigVGANConfig(
    num_mels=8,
    upsample_initial_channel=32,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
    resblock="2",
)


def _torch_up(x, filt, ratio=2):
    import torch

    c = x.shape[1]
    k = filt.shape[-1]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    xp = torch.nn.functional.pad(x, (pad, pad))
    up = ratio * torch.nn.functional.conv_transpose1d(
        xp, filt.expand(c, -1, -1), stride=ratio, groups=c)
    return up[..., pad_left:-pad_right]


def _torch_down(x, filt, ratio=2):
    import torch

    c = x.shape[1]
    k = filt.shape[-1]
    dpl = k // 2 - int(k % 2 == 0)
    dpr = k // 2
    xp = torch.nn.functional.pad(x, (dpl, dpr))
    return torch.nn.functional.conv1d(
        xp, filt.expand(c, -1, -1), stride=ratio, groups=c)


def test_amp_block2_matches_torch_golden():
    """AMPBlock2 wiring (one conv per dilation, residual after each conv —
    reference BigVGAN/modeling_modified/bigvgan.py:149-219) vs a torch
    re-derivation with the same kaiser-sinc alias-free snakebeta."""
    import torch

    from tts_tpu.audio.filters import AliasFreeResample, kaiser_sinc_filter
    from tts_tpu.models.bigvgan import _amp_block2

    rng = np.random.default_rng(7)
    c, k, dils = 4, 3, (1, 3)
    x = rng.standard_normal((1, 32, c)).astype(np.float32)
    alpha_log = rng.standard_normal((len(dils), c)).astype(np.float32) * 0.3
    beta_log = rng.standard_normal((len(dils), c)).astype(np.float32) * 0.3
    ws = rng.standard_normal((len(dils), c, c, k)).astype(np.float32) * 0.2
    bs = rng.standard_normal((len(dils), c)).astype(np.float32) * 0.1

    p = {
        "convs": [{"w": jnp.asarray(ws[j].transpose(2, 1, 0)),
                   "b": jnp.asarray(bs[j])} for j in range(len(dils))],
        "acts": [{"alpha": jnp.asarray(np.exp(alpha_log[j])),
                  "beta_recip": jnp.asarray(np.exp(-beta_log[j]))}
                 for j in range(len(dils))],
    }
    out = np.asarray(_amp_block2(jnp.asarray(x), p, k, dils, SMALL2,
                                 AliasFreeResample(2)))

    filt = torch.from_numpy(
        kaiser_sinc_filter(0.25, 0.3, 12).copy()).view(1, 1, -1)
    xt = torch.from_numpy(x).transpose(1, 2)
    for j, d in enumerate(dils):
        a = torch.from_numpy(np.exp(alpha_log[j])).view(1, c, 1)
        brec = torch.from_numpy(np.exp(-beta_log[j])).view(1, c, 1)
        up = _torch_up(xt, filt)
        up = up + brec * torch.sin(a * up) ** 2
        act = _torch_down(up, filt)
        conv = torch.nn.functional.conv1d(
            act, torch.from_numpy(ws[j]), torch.from_numpy(bs[j]),
            dilation=d, padding=(k * d - d) // 2)
        xt = xt + conv
    ref = xt.transpose(1, 2).numpy()
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-4


def test_generator_resblock2_shape_and_finite():
    params = init_params(SMALL2, jax.random.key(3))
    assert "convs" in params["resblocks"][0]  # block-2 param layout
    mel = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 16, 8)), jnp.float32)
    out = jax.jit(lambda p, m: bigvgan_apply(p, m, SMALL2))(params, mel)
    assert out.shape == (1, 16 * 8)
    assert np.isfinite(np.asarray(out)).all()


def test_resblock2_loader_roundtrip():
    """bigvgan_params_from_state_dict maps the AMPBlock2 upstream key layout
    (resblocks.{n}.convs.{m} + one activation per conv)."""
    import torch

    from tts_tpu.weights.loaders import bigvgan_params_from_state_dict

    cfg = SMALL2
    rng = np.random.default_rng(11)
    sd = {}

    def conv(prefix, cin, cout, k, transposed=False):
        shape = (cin, cout, k) if transposed else (cout, cin, k)
        v = rng.standard_normal(shape).astype(np.float32)
        g_shape = (cin, 1, 1) if transposed else (cout, 1, 1)
        sd[f"{prefix}.weight_g"] = np.ones(g_shape, np.float32)
        sd[f"{prefix}.weight_v"] = v
        sd[f"{prefix}.bias"] = rng.standard_normal(cout).astype(np.float32)

    conv("conv_pre", cfg.num_mels, 32, 7)
    ch_in = 32
    for i, (r, ks) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch_out = cfg.stage_channels[i]
        conv(f"ups.{i}.0", ch_in, ch_out, ks, transposed=True)
        for j, dil in enumerate(cfg.resblock_dilation_sizes):
            n = i * cfg.num_kernels + j
            kk = cfg.resblock_kernel_sizes[j]
            for m in range(len(dil)):
                conv(f"resblocks.{n}.convs.{m}", ch_out, ch_out, kk)
                sd[f"resblocks.{n}.activations.{m}.act.alpha"] = \
                    rng.standard_normal(ch_out).astype(np.float32) * 0.1
                sd[f"resblocks.{n}.activations.{m}.act.beta"] = \
                    rng.standard_normal(ch_out).astype(np.float32) * 0.1
        ch_in = ch_out
    sd["activation_post.act.alpha"] = np.zeros(ch_in, np.float32)
    sd["activation_post.act.beta"] = np.zeros(ch_in, np.float32)
    conv("conv_post", ch_in, 1, 7)

    params = bigvgan_params_from_state_dict(sd, cfg)
    assert "convs" in params["resblocks"][0]
    assert len(params["resblocks"][0]["acts"]) == 2
    mel = jnp.asarray(rng.standard_normal((1, 12, 8)), jnp.float32)
    out = np.asarray(bigvgan_apply(params, mel, cfg))
    assert out.shape == (1, 12 * 8)
    assert np.isfinite(out).all()


# ------------------------------------------------------------ feat_upsample

def test_linear_upsample_4x_matches_torch_interpolate():
    """Exact parity with the reference's feat-upsample interpolation
    (IndexTTS/modeling_modified/models.py:213-218)."""
    import torch

    from tts_tpu.models.bigvgan import linear_upsample_4x

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 9, 5)).astype(np.float32)
    out = np.asarray(linear_upsample_4x(jnp.asarray(x)))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x).transpose(1, 2), scale_factor=4.0, mode="linear"
    ).transpose(1, 2).numpy()
    assert out.shape == ref.shape == (2, 36, 5)
    assert np.abs(out - ref).max() < 1e-6


def test_feat_upsample_generator_length():
    cfg = BigVGANConfig(
        **{**SMALL.__dict__, "feat_upsample": True})
    assert cfg.total_upsample == 4 * 8
    params = init_params(cfg, jax.random.key(4))
    mel = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 10, 8)), jnp.float32)
    out = jax.jit(lambda p, m: bigvgan_apply(p, m, cfg))(params, mel)
    assert out.shape == (1, 10 * 4 * 8)
    assert np.isfinite(np.asarray(out)).all()


def test_staged_forward_matches_monolith():
    """bigvgan_pre/stage/post chained == bigvgan_apply bit-exactly (the
    staged split is a compile-granularity workaround, not a math
    change)."""
    import jax
    import jax.numpy as jnp

    from tts_tpu.models.bigvgan import (bigvgan_apply, bigvgan_post,
                                        bigvgan_pre, bigvgan_stage)
    from tts_tpu.models.bigvgan import BigVGANConfig, init_params

    cfg = BigVGANConfig(
        upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5), resblock_dilation_sizes=((1, 2), (1, 2)),
        num_mels=10)
    params = init_params(cfg, jax.random.key(0))
    mel = jax.random.normal(jax.random.key(1), (1, 24, 10), jnp.float32)

    ref = bigvgan_apply(params, mel, cfg, fused=False)
    x = bigvgan_pre(params, mel, cfg)
    for i in range(len(cfg.upsample_rates)):
        x = bigvgan_stage(params, x, i, cfg, fused=False)
    out = bigvgan_post(params, x, cfg)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_vocoder_staged_benchmark_path_matches_forward():
    """BigVGANVocoder._forward_staged (the two jitted halves used by
    benchmark(staged=True)) == the monolith _forward, including the
    int16 conversion."""
    import jax
    import jax.numpy as jnp

    from tts_tpu.models.bigvgan import BigVGANConfig, init_params
    from tts_tpu.runtime.vocoder import BigVGANVocoder

    cfg = BigVGANConfig(
        upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
        num_mels=10)
    params = init_params(cfg, jax.random.key(2))
    voc = BigVGANVocoder(params, cfg, dtype=jnp.float32)
    mel = jax.random.normal(jax.random.key(3), (1, 16, 10), jnp.float32)
    ref = np.asarray(voc._forward(voc.params, mel))
    out = np.asarray(voc._forward_staged(voc.params, mel))
    np.testing.assert_array_equal(out, ref)
