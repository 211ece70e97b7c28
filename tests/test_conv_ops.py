"""Conv primitive parity vs torch, and anti-aliased resampling parity vs a
torch implementation of the alias-free up/down design
(reference BigVGAN/modeling_modified/resample.py:11-52)."""
import numpy as np
import pytest
import torch

from tts_tpu.audio.filters import AliasFreeResample, kaiser_sinc_filter
from tts_tpu.ops import conv1d, conv_transpose1d


@pytest.mark.parametrize("stride,pad,dil,groups", [
    (1, 3, 1, 1), (2, 2, 1, 1), (1, 5, 5, 1), (1, 1, 1, 4),
])
def test_conv1d_matches_torch(stride, pad, dil, groups):
    rng = np.random.default_rng(0)
    b, t, cin, cout, k = 2, 37, 8, 12, 3
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin // groups, cout)).astype(np.float32)
    bias = rng.standard_normal(cout).astype(np.float32)

    out = np.asarray(conv1d(x, w, bias, stride, pad, dil, groups))
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x).transpose(1, 2),
        torch.from_numpy(w).permute(2, 1, 0),
        torch.from_numpy(bias), stride=stride, padding=pad,
        dilation=dil, groups=groups,
    ).transpose(1, 2).numpy()
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-4


@pytest.mark.parametrize("stride,pad,groups", [(2, 3, 1), (4, 2, 1), (2, 0, 6)])
def test_conv_transpose1d_matches_torch(stride, pad, groups):
    rng = np.random.default_rng(1)
    b, t, cin, k = 1, 19, 6, 8
    cout_per_group = 3 if groups == 1 else 1
    cout = cout_per_group * groups
    x = rng.standard_normal((b, t, cin)).astype(np.float32)
    w = rng.standard_normal((k, cin // groups, cout)).astype(np.float32)

    out = np.asarray(conv_transpose1d(x, w, None, stride, pad, groups))
    # torch ConvTranspose1d weight layout: (C_in, C_out/groups, K)
    w_t = torch.from_numpy(w).permute(1, 2, 0)  # (cin/groups, cout, k) -> need (cin, cout/groups, k)
    w_t = torch.from_numpy(w).permute(1, 2, 0).reshape(groups, cin // groups, cout_per_group * (groups if groups == 1 else 1), k)
    # simpler: build torch weight by inverse mapping
    wt = np.zeros((cin, cout // groups, k), np.float32)
    for g in range(groups):
        for ci in range(cin // groups):
            for co in range(cout // groups):
                wt[g * (cin // groups) + ci, co] = w[:, ci, g * (cout // groups) + co]
    ref = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x).transpose(1, 2), torch.from_numpy(wt),
        stride=stride, padding=pad, groups=groups,
    ).transpose(1, 2).numpy()
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() < 1e-4


def _torch_alias_free(x_np, ratio=2):
    """torch reference of UpSample1d/DownSample1d (zero-padded variant)."""
    kernel_size = int(6 * ratio // 2) * 2
    filt = torch.from_numpy(
        kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, kernel_size).copy()
    ).view(1, 1, -1)
    x = torch.from_numpy(x_np).transpose(1, 2)  # (B, C, T)
    c = x.shape[1]
    stride = ratio
    pad = kernel_size // ratio - 1
    pad_left = pad * stride + (kernel_size - stride) // 2
    pad_right = pad * stride + (kernel_size - stride + 1) // 2
    xp = torch.nn.functional.pad(x, (pad, pad))
    up = ratio * torch.nn.functional.conv_transpose1d(
        xp, filt.expand(c, -1, -1), stride=stride, groups=c
    )
    up = up[..., pad_left:-pad_right]

    even = kernel_size % 2 == 0
    dpl = kernel_size // 2 - int(even)
    dpr = kernel_size // 2
    upp = torch.nn.functional.pad(up, (dpl, dpr))
    down = torch.nn.functional.conv1d(
        upp, filt.expand(c, -1, -1), stride=ratio, groups=c
    )
    return up.transpose(1, 2).numpy(), down.transpose(1, 2).numpy()


def test_alias_free_resample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 64, 4)).astype(np.float32)
    rs = AliasFreeResample(2)
    up = np.asarray(rs.upsample(x))
    down = np.asarray(rs.downsample(np.asarray(up)))
    ref_up, ref_down = _torch_alias_free(x)
    assert up.shape == ref_up.shape == (1, 128, 4)
    assert np.abs(up - ref_up).max() < 1e-5
    assert down.shape == ref_down.shape == (1, 64, 4)
    assert np.abs(down - ref_down).max() < 1e-5


def test_alias_free_upsample_non_divisible_kernel():
    """kernel_size not a multiple of ratio: polyphase output must match the
    transposed-conv definition's length ((Tp-1)*R + K minus crops)."""
    import jax.numpy as jnp

    from tts_tpu.audio.filters import AliasFreeResample

    rs = AliasFreeResample(2, kernel_size=9)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 37, 3)),
                    jnp.float32)
    y = rs.upsample(x)
    tp = 37 + 2 * rs.up_pad
    full = (tp - 1) * 2 + 9
    assert y.shape[1] == full - rs.up_crop_left - rs.up_crop_right
    assert np.isfinite(np.asarray(y)).all()


def test_alias_free_act_matches_unfused_pair():
    """alias_free_act (polyphase fused up->act->down, the BigVGAN hot
    path) must equal downsample(act(upsample(x))) to rounding, for the
    default and custom even kernel sizes, odd/even lengths, and both
    snake variants."""
    import jax.numpy as jnp

    from tts_tpu.audio.snake import snake, snake_beta

    rng = np.random.default_rng(3)
    for ks in (None, 8, 16):
        rs = AliasFreeResample(2) if ks is None else AliasFreeResample(2, ks)
        for t in (17, 64):
            x = jnp.asarray(rng.standard_normal((2, t, 5)), jnp.float32)
            a = jnp.asarray(rng.uniform(0.5, 2.0, (5,)), jnp.float32)
            b = jnp.asarray(rng.uniform(0.5, 2.0, (5,)), jnp.float32)
            for act in (lambda u: snake_beta(u, a, b),
                        lambda u: snake(u, a, b)):
                ref = rs.downsample(act(rs.upsample(x)))
                out = rs.alias_free_act(x, act)
                assert out.shape == ref.shape
                assert np.abs(np.asarray(out - ref)).max() < 1e-6


def test_alias_free_act_odd_ratio_falls_back():
    """Non-2 ratios route through the unfused pair (identical result by
    construction) — guard the fallback stays wired."""
    import jax.numpy as jnp

    rs = AliasFreeResample(4)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 32, 3)),
                    jnp.float32)
    act = jnp.tanh
    ref = rs.downsample(act(rs.upsample(x)))
    out = rs.alias_free_act(x, act)
    assert np.abs(np.asarray(out - ref)).max() == 0.0


def test_conv_pos_embed_fused_matches_im2col_chain():
    """Pallas fused conv-pos-embed (ops/grouped_conv.py) vs the im2col
    reference chain in models/f5.input_embedding — same padding, weight
    layout, cast/bias order, and mish rounding (interpret mode on CPU)."""
    import jax
    import jax.numpy as jnp

    from tts_tpu.models.f5 import _grouped_conv_mm
    from tts_tpu.ops.grouped_conv import conv_pos_embed_fused

    rng = np.random.default_rng(3)
    B, T, C, K, g = 2, 64, 128, 31, 4
    cin = C // g
    x = jnp.asarray(rng.standard_normal((B, T, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((K, cin, C)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((K, cin, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)

    def mish(c):
        return c * jnp.tanh(jax.nn.softplus(c))

    ref = _grouped_conv_mm(x, w1, b1)
    ref = mish(ref)
    ref = _grouped_conv_mm(ref, w2, b2)
    ref = mish(ref) + x

    out = conv_pos_embed_fused(x, w1, b1, w2, b2, groups=g, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
