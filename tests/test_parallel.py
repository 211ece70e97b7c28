"""Mesh/sharding helpers: tensor-parallel inference must match single-device
output (XLA inserts the collectives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.parallel import make_mesh, replicate, shard_params_tp


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_make_mesh_shapes():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(dp=16)


def test_tp_sharded_dit_matches_single_device():
    from tts_tpu.models.f5 import F5Config, dit_forward, init_params

    cfg = F5Config(dim=32, depth=2, heads=4, head_dim=8, ff_mult=2,
                   text_dim=16, conv_layers=1, n_mels=8, vocab_size=16,
                   nfe_steps=4, max_signal_len=64, freq_embed_dim=16)
    params = init_params(cfg, jax.random.key(0))
    t = 16
    noise = jax.random.normal(jax.random.key(1), (1, t, cfg.n_mels))
    cond = jax.random.normal(jax.random.key(2),
                             (1, t, cfg.n_mels + cfg.text_dim))

    def fwd(p):
        pred, pred1 = dit_forward(
            p, noise, cond, jnp.zeros_like(cond), p["time_table"][0],
            p["rope_cos"][:t], p["rope_sin"][:t], cfg)
        return pred

    ref = np.asarray(jax.jit(fwd)(params))

    mesh = make_mesh(dp=1, tp=4)
    sharded = shard_params_tp(params, mesh)
    with mesh:
        out = np.asarray(jax.jit(fwd)(sharded))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_replicate():
    mesh = make_mesh(dp=2, tp=4)
    params = {"w": jnp.ones((16, 16))}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.is_fully_replicated
