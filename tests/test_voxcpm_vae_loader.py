"""VoxCPM AudioVAE loader: synthetic torch-layout state dict (weight-normed
convs, depthwise residual units, sample-rate-conditioned decoder blocks)
-> pytree, driven through vae_encode / vae_decode.

Key layout mirrors modeling_modified/audio_vae.py; the v2 sr-conditioning
keys mirror the v2 export (Export_VoxCPM_ONNX.py:884-905)."""
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.voxcpm import VaeConfig, vae_decode, vae_encode
from tts_tpu.weights.voxcpm_loader import vae_from_state_dict

TINY = VaeConfig(d_model=4, latent_dim=6, strides=(2, 4),
                 decoder_channels=16, decoder_rates=(4, 4),
                 depthwise=True, sr_bins=(22050.0, 44100.0))


def _wn_conv(sd, pre, cout, cin, k, rng, transposed=False):
    shape = (cin, cout, k) if transposed else (cout, cin, k)
    v = (rng.standard_normal(shape) * 0.1).astype(np.float32)
    g_shape = (cin, 1, 1) if transposed else (cout, 1, 1)
    sd[f"{pre}.weight_g"] = np.abs(
        rng.standard_normal(g_shape).astype(np.float32)) + 0.5
    sd[f"{pre}.weight_v"] = v
    sd[f"{pre}.bias"] = (rng.standard_normal(cout) * 0.02).astype(np.float32)


def _snake(sd, pre, c, rng):
    sd[f"{pre}.alpha"] = np.abs(
        rng.standard_normal((1, c, 1)).astype(np.float32)) + 0.5


def _unit(sd, pre, c, rng, depthwise):
    _snake(sd, f"{pre}.block.0", c, rng)
    _wn_conv(sd, f"{pre}.block.1", c, 1 if depthwise else c, 7, rng)
    _snake(sd, f"{pre}.block.2", c, rng)
    _wn_conv(sd, f"{pre}.block.3", c, c, 1, rng)


def _build_state_dict(cfg, rng):
    sd = {}
    e = "audio_vae.encoder"
    _wn_conv(sd, f"{e}.block.0", cfg.d_model, 1, 7, rng)
    ch = cfg.d_model
    for i, stride in enumerate(cfg.strides):
        b = f"{e}.block.{i + 1}.block"
        for j in range(3):
            _unit(sd, f"{b}.{j}", ch, rng, cfg.depthwise)
        _snake(sd, f"{b}.3", ch, rng)
        _wn_conv(sd, f"{b}.4", 2 * ch, ch, 2 * stride, rng)
        ch *= 2
    _wn_conv(sd, f"{e}.fc_mu", cfg.latent_dim, ch, 3, rng)

    d = "audio_vae.decoder.model"
    rates = cfg.decoder_rates or tuple(reversed(cfg.strides))
    dc = cfg.decoder_channels
    # depthwise init pair: model.0 = dw k7, model.1 = pw
    _wn_conv(sd, f"{d}.0", cfg.latent_dim, 1, 7, rng)
    _wn_conv(sd, f"{d}.1", dc, cfg.latent_dim, 1, rng)
    for i, r in enumerate(rates):
        cin, cout = dc // 2 ** i, dc // 2 ** (i + 1)
        b = f"{d}.{i + 2}.block"
        _snake(sd, f"{b}.0", cin, rng)
        _wn_conv(sd, f"{b}.1", cout, cin, 2 * r, rng, transposed=True)
        for j in range(3):
            _unit(sd, f"{b}.{2 + j}", cout, rng, cfg.depthwise)
        # v2 sample-rate conditioning layer paired with this block
        sr = f"audio_vae.decoder.sr_cond_model.{i + 2}"
        nbins = len(cfg.sr_bins) + 1
        sd[f"{sr}.scale_embed.weight"] = np.ones((nbins, cin), np.float32) \
            + rng.standard_normal((nbins, cin)).astype(np.float32) * 0.01
        sd[f"{sr}.bias_embed.weight"] = (
            rng.standard_normal((nbins, cin)) * 0.01).astype(np.float32)
    n = len(rates)
    out_dim = dc // 2 ** n
    _snake(sd, f"{d}.{n + 2}", out_dim, rng)
    _wn_conv(sd, f"{d}.{n + 3}", 1, out_dim, 7, rng)
    return sd


def test_vae_loader_roundtrip():
    rng = np.random.default_rng(0)
    sd = _build_state_dict(TINY, rng)
    params = vae_from_state_dict(sd, TINY)

    # depthwise residual-unit kernels must load as (k, 1, C)
    assert params["enc_blocks"][0]["units"][0]["c1"]["w"].shape == (7, 1, 4)
    assert params["dec"]["dec_blocks"][0]["units"][0]["c1"]["w"].shape[1] == 1
    # sr-conditioning embeddings present on every decoder block
    for blk in params["dec"]["dec_blocks"]:
        assert "sr_scale" in blk and "sr_bias" in blk

    n = 4 * TINY.encoder_stride
    audio = jnp.asarray(rng.standard_normal((1, n)) * 0.1, jnp.float32)
    lat = jax.jit(lambda p, a: vae_encode(p, a, TINY))(params, audio)
    assert lat.shape == (1, 4, TINY.latent_dim)
    wav = jax.jit(lambda p, z: vae_decode(p["dec"], z, TINY, sr_idx=2))(
        params, lat)
    assert wav.shape == (1, 4 * TINY.decoder_stride)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_vae_loader_snake_reciprocal():
    """Snake alpha_recip = 1/(alpha + 1e-9), matching the reference's
    precomputed buffer (audio_vae.py:60-68)."""
    rng = np.random.default_rng(1)
    sd = _build_state_dict(TINY, rng)
    params = vae_from_state_dict(sd, TINY)
    alpha = np.asarray(sd["audio_vae.encoder.block.1.block.3.alpha"]
                       ).reshape(-1).astype(np.float64)
    got = np.asarray(params["enc_blocks"][0]["snake"]["alpha_recip"])
    np.testing.assert_allclose(got, 1.0 / (alpha + 1e-9), rtol=1e-6)
