"""The reference's OWN torch code as the oracle (VERDICT r3 item 2).

Earlier golden tests diff tts_tpu against the builder's torch
re-implementations of the reference formulas — they cannot catch a
shared misreading. These tests import and EXECUTE the reference's
modeling_modified files (via tests/oracle_loader.py) with shared random
weights and assert elementwise deltas against the tts_tpu kernels,
loaders, and model stacks:

- BigVGAN/modeling_modified/filter.py kaiser_sinc_filter1d
  vs audio/filters.kaiser_sinc_filter
- resample.py UpSample1d / DownSample1d vs AliasFreeResample
- F5_TTS/STFT_Process.py stft_A/B + istft_A/B forward (:67-173)
  vs audio/stft.StftKernel / IstftKernel
- the full modified BigVGAN generator (bigvgan.py:31-516 + act.py)
  vs weights/loaders.bigvgan_params_from_state_dict + bigvgan_apply
"""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent))

torch = pytest.importorskip("torch")

from oracle_loader import (  # noqa: E402
    load_alias_free_chain,
    load_ref_bigvgan,
    load_stft_process,
)

from tts_tpu.audio.filters import AliasFreeResample, kaiser_sinc_filter  # noqa: E402
from tts_tpu.audio.stft import IstftKernel, StftKernel  # noqa: E402


# ---------------------------------------------------------------- filters


def test_kaiser_sinc_filter_oracle():
    filt, _, _, _ = load_alias_free_chain()
    for cutoff, hw, ks in [(0.25, 0.3, 12), (0.125, 0.15, 12),
                           (0.25, 0.3, 11), (0.5, 0.6, 12)]:
        ref = filt.kaiser_sinc_filter1d(cutoff, hw, ks).numpy().ravel()
        ours = kaiser_sinc_filter(cutoff, hw, ks)
        np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-5)


def _pre_expanded(mod, c):
    """The buffers bigvgan.py:361-382 pre-expands per channel count."""
    up, dn = mod.upsample, mod.downsample.lowpass
    return {
        "up_filter_pad": up.filter.expand(c, -1, -1),
        "up_pad_zeros": torch.zeros((1, c, up.pad)),
        "down_filter_pad": dn.filter.expand(c, -1, -1),
        "down_pad_zeros_L": torch.zeros((1, c, dn.pad_left)),
        "down_pad_zeros_R": torch.zeros((1, c, dn.pad_right)),
    }


def test_upsample_downsample_oracle():
    _, res, act, _ = load_alias_free_chain()
    rng = np.random.default_rng(0)
    c, t = 6, 200
    x = rng.standard_normal((1, c, t)).astype(np.float32)

    a1 = act.Activation1d(activation=torch.nn.Identity())
    buf = _pre_expanded(a1, c)
    with torch.no_grad():
        up_ref = a1.upsample(torch.from_numpy(x), c,
                             buf["up_filter_pad"],
                             buf["up_pad_zeros"]).numpy()
        dn_ref = a1.downsample(torch.from_numpy(x), c,
                               buf["down_filter_pad"],
                               buf["down_pad_zeros_L"],
                               buf["down_pad_zeros_R"]).numpy()

    rs = AliasFreeResample(2)
    xj = jnp.asarray(np.swapaxes(x, 1, 2))            # ours is (B, T, C)
    up = np.swapaxes(np.asarray(rs.upsample(xj)), 1, 2)
    dn = np.swapaxes(np.asarray(rs.downsample(xj)), 1, 2)
    np.testing.assert_allclose(up, up_ref, atol=2e-6)
    np.testing.assert_allclose(dn, dn_ref, atol=2e-6)


def test_alias_free_act_chain_oracle():
    """Full up->act->down chain (act.py:26-29) vs the fused phase-space
    alias_free_act, with sin as the elementwise activation on both
    sides (isolates the chain; snake itself is covered by the full
    generator oracle below)."""
    _, _, act, _ = load_alias_free_chain()
    rng = np.random.default_rng(1)
    c, t = 4, 300
    x = rng.standard_normal((1, c, t)).astype(np.float32)

    class Sin(torch.nn.Module):
        def forward(self, v):
            return torch.sin(v)

    a1 = act.Activation1d(activation=Sin())
    buf = _pre_expanded(a1, c)
    with torch.no_grad():
        ref = a1(torch.from_numpy(x), c, buf["up_filter_pad"],
                 buf["up_pad_zeros"], buf["down_filter_pad"],
                 buf["down_pad_zeros_L"], buf["down_pad_zeros_R"]).numpy()

    rs = AliasFreeResample(2)
    xj = jnp.asarray(np.swapaxes(x, 1, 2))
    fused = np.swapaxes(np.asarray(rs.alias_free_act(xj, jnp.sin)), 1, 2)
    pair = np.swapaxes(
        np.asarray(rs.downsample(jnp.sin(rs.upsample(xj)))), 1, 2)
    np.testing.assert_allclose(fused, ref, atol=3e-6)
    np.testing.assert_allclose(pair, ref, atol=3e-6)


# ------------------------------------------------------------------- STFT


@pytest.mark.parametrize("n_fft,win,hop", [(512, 400, 160), (256, 256, 64)])
def test_stft_oracle(n_fft, win, hop):
    m = load_stft_process()
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(4000) * 0.3).astype(np.float32)

    stft_b = m.STFT_Process("stft_B", n_fft=n_fft, win_length=win,
                            hop_len=hop, max_frames=0, window_type="hann")
    with torch.no_grad():
        re_ref, im_ref = stft_b(torch.from_numpy(x)[None, None], "constant")

    kern = StftKernel(n_fft, hop, win)
    re, im = kern(jnp.asarray(x)[None], pad_mode="constant")
    # frame-count conventions differ by <=1 trailing frame; compare the
    # shared prefix (reference: (N - n_fft + 2*half)//hop + 1; ours:
    # N//hop + 1 — equal when n_fft divides into N//hop cleanly)
    t = min(re.shape[-1], re_ref.shape[-1])
    np.testing.assert_allclose(np.asarray(re)[..., :t],
                               re_ref.numpy()[..., :t], atol=2e-3)
    np.testing.assert_allclose(np.asarray(im)[..., :t],
                               im_ref.numpy()[..., :t], atol=2e-3)

    stft_a = m.STFT_Process("stft_A", n_fft=n_fft, win_length=win,
                            hop_len=hop, max_frames=0, window_type="hann")
    with torch.no_grad():
        re_only = stft_a(torch.from_numpy(x)[None, None], "constant")
    np.testing.assert_allclose(np.asarray(re)[..., :t],
                               re_only.numpy()[..., :t], atol=2e-3)


def test_istft_oracle():
    n_fft, win, hop, frames = 512, 400, 160, 40
    m = load_stft_process()
    rng = np.random.default_rng(3)
    f = n_fft // 2 + 1
    re = (rng.standard_normal((1, f, frames)) * 2).astype(np.float32)
    im = (rng.standard_normal((1, f, frames)) * 2).astype(np.float32)

    ist = m.STFT_Process("istft_B", n_fft=n_fft, win_length=win,
                         hop_len=hop, max_frames=frames,
                         window_type="hann")
    with torch.no_grad():
        wav_ref = ist(torch.from_numpy(re), torch.from_numpy(im)).numpy()

    kern = IstftKernel(n_fft, hop, win)
    wav = np.asarray(kern(jnp.asarray(re), jnp.asarray(im)))
    assert wav.shape[-1] == wav_ref.shape[-1]
    np.testing.assert_allclose(wav[0], wav_ref[0, 0], atol=1e-4)

    # istft_A (magnitude, phase) variant
    mag = np.abs(re) + 0.1
    ph = (rng.standard_normal((1, f, frames)) * np.pi).astype(np.float32)
    ist_a = m.STFT_Process("istft_A", n_fft=n_fft, win_length=win,
                           hop_len=hop, max_frames=frames,
                           window_type="hann")
    with torch.no_grad():
        wav_ref_a = ist_a(torch.from_numpy(mag), torch.from_numpy(ph)).numpy()
    wav_a = np.asarray(kern.from_mag_phase(jnp.asarray(mag),
                                           jnp.asarray(ph)))
    np.testing.assert_allclose(wav_a[0], wav_ref_a[0, 0], atol=1e-4)


# ------------------------------------------------------- BigVGAN generator


def test_bigvgan_generator_oracle():
    """The reference's modified BigVGAN generator end-to-end (random
    weights) vs bigvgan_params_from_state_dict + bigvgan_apply.

    The reference pre-builds its post-activation pad buffers at size 15
    instead of the UpSample1d pad of 5 (bigvgan.py:371,382-383), which
    lengthens its output symmetrically; the comparison aligns the
    centers and checks the overlap exactly."""
    from tts_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply
    from tts_tpu.weights.loaders import bigvgan_params_from_state_dict

    bv = load_ref_bigvgan()
    torch.manual_seed(0)
    h = bv.AttrDict(
        num_mels=8, upsample_initial_channel=32,
        upsample_rates=[2, 2], upsample_kernel_sizes=[4, 4],
        resblock="1", resblock_kernel_sizes=[3, 5],
        resblock_dilation_sizes=[[1, 3], [1, 3]],
        activation="snakebeta", snake_logscale=True,
        use_tanh_at_final=True, use_bias_at_final=True,
    )
    ref = bv.BigVGAN(h)
    # randomize the (zero-init) snake params so the oracle exercises them
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if name.endswith((".alpha", ".beta")):
                p.copy_(torch.randn_like(p) * 0.3)
    ref.eval()

    rng = np.random.default_rng(4)
    mel = (rng.standard_normal((1, 8, 96)) * 0.5).astype(np.float32)
    with torch.no_grad():
        wav_ref = ref(torch.from_numpy(mel)).numpy()[0, 0]

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = BigVGANConfig(
        num_mels=8, upsample_initial_channel=32,
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        resblock="1", resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        activation="snakebeta", snake_logscale=True,
        use_tanh_at_final=True, use_bias_at_final=True)
    params = bigvgan_params_from_state_dict(sd, cfg)
    wav = np.asarray(
        bigvgan_apply(params, jnp.asarray(np.swapaxes(mel, 1, 2)), cfg,
                      fused=False))[0]

    extra = wav_ref.shape[-1] - wav.shape[-1]
    assert extra >= 0 and extra % 2 == 0, (wav_ref.shape, wav.shape)
    off = extra // 2
    ref_mid = wav_ref[off:off + wav.shape[-1]] if extra else wav_ref
    err = np.abs(wav - ref_mid)
    # the pad-size quirk perturbs only the outermost samples (the
    # post-act lowpass tail, < 40 samples/side here); the interior is
    # exact and the edges stay bounded
    assert err[40:-40].max() < 5e-6, err[40:-40].max()
    assert err.max() < 2e-2, err.max()
