"""F5 full-checkpoint loader: synthetic upstream-key safetensors file +
vocab.txt -> load_f5 -> dit_forward, plus the q/k prescale fold check
(reference export surgery, Export_F5.py:329-333)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.f5 import F5Config, dit_forward

safetensors = pytest.importorskip("safetensors.numpy")

TINY = F5Config(dim=16, depth=2, heads=2, head_dim=8, ff_mult=2, text_dim=8,
                conv_layers=1, n_mels=4, vocab_size=3, nfe_steps=4,
                max_signal_len=64, freq_embed_dim=8)


def _build_state_dict(cfg, rng):
    sd = {}

    def add(key, *shape, s=0.05):
        sd[key] = (rng.standard_normal(shape) * s).astype(np.float32)

    t = "transformer"
    # text embed: +1 filler row
    add(f"{t}.text_embed.text_embed.weight", cfg.vocab_size + 1, cfg.text_dim)
    for i in range(cfg.conv_layers):
        p = f"{t}.text_embed.text_blocks.{i}"
        add(f"{p}.dwconv.weight", cfg.text_dim, 1, 7)
        add(f"{p}.dwconv.bias", cfg.text_dim)
        add(f"{p}.norm.weight", cfg.text_dim, s=1.0)
        add(f"{p}.norm.bias", cfg.text_dim)
        add(f"{p}.pwconv1.weight", 2 * cfg.text_dim, cfg.text_dim)
        add(f"{p}.pwconv1.bias", 2 * cfg.text_dim)
        add(f"{p}.grn.gamma", 1, 1, 2 * cfg.text_dim)
        add(f"{p}.grn.beta", 1, 1, 2 * cfg.text_dim)
        add(f"{p}.pwconv2.weight", cfg.text_dim, 2 * cfg.text_dim)
        add(f"{p}.pwconv2.bias", cfg.text_dim)
    in_dim = 2 * cfg.n_mels + cfg.text_dim
    add(f"{t}.input_embed.proj.weight", cfg.dim, in_dim)
    add(f"{t}.input_embed.proj.bias", cfg.dim)
    for j in (0, 2):
        add(f"{t}.input_embed.conv_pos_embed.conv1d.{j}.weight",
            cfg.dim, cfg.dim // 16 if cfg.dim % 16 == 0 else 1, 31)
        add(f"{t}.input_embed.conv_pos_embed.conv1d.{j}.bias", cfg.dim)
    inner = cfg.heads * cfg.head_dim
    for i in range(cfg.depth):
        p = f"{t}.transformer_blocks.{i}"
        add(f"{p}.attn_norm.linear.weight", 6 * cfg.dim, cfg.dim)
        add(f"{p}.attn_norm.linear.bias", 6 * cfg.dim)
        for nm in ("to_q", "to_k", "to_v"):
            add(f"{p}.attn.{nm}.weight", inner, cfg.dim)
            add(f"{p}.attn.{nm}.bias", inner)
        add(f"{p}.attn.to_out.0.weight", cfg.dim, inner)
        add(f"{p}.attn.to_out.0.bias", cfg.dim)
        add(f"{p}.ff.ff.0.0.weight", cfg.ff_mult * cfg.dim, cfg.dim)
        add(f"{p}.ff.ff.0.0.bias", cfg.ff_mult * cfg.dim)
        add(f"{p}.ff.ff.2.weight", cfg.dim, cfg.ff_mult * cfg.dim)
        add(f"{p}.ff.ff.2.bias", cfg.dim)
    add(f"{t}.norm_out.linear.weight", 2 * cfg.dim, cfg.dim)
    add(f"{t}.norm_out.linear.bias", 2 * cfg.dim)
    add(f"{t}.proj_out.weight", cfg.n_mels, cfg.dim)
    add(f"{t}.proj_out.bias", cfg.n_mels)
    add(f"{t}.time_embed.time_mlp.0.weight", cfg.dim, cfg.freq_embed_dim)
    add(f"{t}.time_embed.time_mlp.0.bias", cfg.dim)
    add(f"{t}.time_embed.time_mlp.2.weight", cfg.dim, cfg.dim)
    add(f"{t}.time_embed.time_mlp.2.bias", cfg.dim)
    return sd


def test_load_f5_end_to_end(tmp_path):
    from tts_tpu.weights.f5_loader import load_f5

    rng = np.random.default_rng(0)
    sd = _build_state_dict(TINY, rng)
    # the upstream checkpoint stores everything under ema_model_state_dict
    # with an ema_model. prefix (Export_F5.py:206-221)
    ckpt = tmp_path / "model.safetensors"
    safetensors.save_file(
        {f"ema_model.{k}": v for k, v in sd.items()}, str(ckpt))
    vocab = tmp_path / "vocab.txt"
    vocab.write_text(" \na\nb\n")

    params, cfg, vmap = load_f5(str(ckpt), str(vocab), cfg=TINY)
    assert vmap == {" ": 0, "a": 1, "b": 2}
    assert len(params["blocks"]) == TINY.depth
    assert params["time_table"].shape == (TINY.nfe_steps, TINY.dim)

    # q/k prescale fold + half-split rope column permutation (models/f5.hs_perm)
    from tts_tpu.models.f5 import hs_perm

    scale = TINY.head_dim ** -0.25
    inner = TINY.heads * TINY.head_dim
    col_perm = (np.arange(inner).reshape(TINY.heads, TINY.head_dim)
                [:, hs_perm(TINY.head_dim)].reshape(-1))
    got = np.asarray(params["blocks"][0]["attn"]["wqkv"])
    raw_q = sd["transformer.transformer_blocks.0.attn.to_q.weight"].T
    raw_v = sd["transformer.transformer_blocks.0.attn.to_v.weight"].T
    np.testing.assert_allclose(got[:, :inner], (raw_q * scale)[:, col_perm],
                               rtol=1e-6)
    np.testing.assert_allclose(got[:, 2 * inner:], raw_v, rtol=1e-6)

    t = 16
    noise = jnp.zeros((1, t, TINY.n_mels))
    cond = jnp.zeros((1, t, TINY.n_mels + TINY.text_dim))
    pred, pred1 = jax.jit(lambda p: dit_forward(
        p, noise, cond, cond, p["time_table"][0], p["rope_cos"][:t],
        p["rope_sin"][:t], TINY))(params)
    assert pred.shape == (1, t, TINY.n_mels)
    assert np.isfinite(np.asarray(pred)).all()
