"""Checkpoint-loader tests: weight-norm collapse parity vs torch, and a full
synthetic upstream-layout BigVGAN state dict mapped and run end-to-end."""
import numpy as np
import torch

from tts_tpu.models.bigvgan import BigVGANConfig, bigvgan_apply
from tts_tpu.weights import bigvgan_params_from_state_dict, collapse_weight_norm

SMALL = BigVGANConfig(
    num_mels=8,
    upsample_initial_channel=32,
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
)


def test_weight_norm_collapse_matches_torch():
    conv = torch.nn.Conv1d(4, 6, 3)
    wn = torch.nn.utils.weight_norm(conv)
    g = wn.weight_g.detach().numpy()
    v = wn.weight_v.detach().numpy()
    torch.nn.utils.remove_weight_norm(wn)
    ref = wn.weight.detach().numpy()
    out = collapse_weight_norm(g, v)
    assert np.abs(out - ref).max() < 1e-6


def _synthetic_state_dict(cfg: BigVGANConfig, rng):
    """Build an upstream-layout state dict (weight-norm split, torch conv
    layouts, log-scale snake params)."""
    sd = {}

    def add_conv(prefix, cin, cout, k, bias=True):
        v = rng.standard_normal((cout, cin, k)).astype(np.float32) * 0.1
        sd[prefix + ".weight_g"] = np.linalg.norm(
            v.reshape(cout, -1), axis=1
        ).reshape(cout, 1, 1).astype(np.float32)
        sd[prefix + ".weight_v"] = v
        if bias:
            sd[prefix + ".bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1

    def add_convt(prefix, cin, cout, k):
        v = rng.standard_normal((cin, cout, k)).astype(np.float32) * 0.1
        sd[prefix + ".weight_g"] = np.linalg.norm(
            v.reshape(cin, -1), axis=1
        ).reshape(cin, 1, 1).astype(np.float32)
        sd[prefix + ".weight_v"] = v
        sd[prefix + ".bias"] = rng.standard_normal(cout).astype(np.float32) * 0.1

    def add_snake(prefix, c):
        sd[prefix + ".alpha"] = rng.standard_normal(c).astype(np.float32) * 0.1
        sd[prefix + ".beta"] = rng.standard_normal(c).astype(np.float32) * 0.1

    c0 = cfg.upsample_initial_channel
    add_conv("conv_pre", cfg.num_mels, c0, 7)
    cin = c0
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cout = cfg.stage_channels[i]
        add_convt(f"ups.{i}.0", cin, cout, k)
        for j, (ks, dil) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            n = i * cfg.num_kernels + j
            for m in range(len(dil)):
                add_conv(f"resblocks.{n}.convs1.{m}", cout, cout, ks)
                add_conv(f"resblocks.{n}.convs2.{m}", cout, cout, ks)
            for m in range(2 * len(dil)):
                add_snake(f"resblocks.{n}.activations.{m}.act", cout)
        cin = cout
    add_snake("activation_post.act", cin)
    add_conv("conv_post", cin, 1, 7, bias=cfg.use_bias_at_final)
    return sd


def test_bigvgan_loader_end_to_end():
    rng = np.random.default_rng(0)
    sd = _synthetic_state_dict(SMALL, rng)
    params = bigvgan_params_from_state_dict(sd, SMALL)
    # snake params exponentiated
    n0 = "resblocks.0.activations.0.act"
    np.testing.assert_allclose(
        np.asarray(params["resblocks"][0]["acts1"][0]["alpha"]),
        np.exp(sd[n0 + ".alpha"]), rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(params["resblocks"][0]["acts1"][0]["beta_recip"]),
        1.0 / (np.exp(sd[n0 + ".beta"]) + 1e-9), rtol=1e-5,
    )
    mel = rng.standard_normal((1, 12, 8)).astype(np.float32)
    out = bigvgan_apply(params, mel, SMALL)
    assert out.shape == (1, 12 * 8)
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_dict_diagnostics():
    """CheckpointDict: a missing key names the closest present keys; unused
    keys warn unless ignored — the real-checkpoint drift safety net."""
    import warnings

    import pytest

    from tts_tpu.weights.loaders import CheckpointDict

    sd = CheckpointDict({"model.layers.0.attn.weight": np.zeros(2),
                         "model.layers.0.mlp.weight": np.zeros(2),
                         "discriminator.conv.weight": np.zeros(2)}, "fam")
    with pytest.raises(KeyError) as ei:
        sd["model.layers.0.attn.wieght"]
    msg = str(ei.value)
    assert "fam" in msg and "model.layers.0.attn.weight" in msg

    _ = sd["model.layers.0.attn.weight"]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sd.warn_unused(ignore_substrings=("discriminator",))
    assert len(w) == 1 and "1 checkpoint keys" in str(w[0].message)

    # fully consumed (after ignores) -> silent
    _ = sd["model.layers.0.mlp.weight"]
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sd.warn_unused(ignore_substrings=("discriminator",))
    assert not w
