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


def test_tp_sharded_f5_pipeline_matches_single_device():
    """Pipeline-level tensor-parallel serving: F5Pipeline(mesh=...) must
    produce bit-identical audio to the single-device pipeline."""
    from tts_tpu.models.f5 import F5Config, init_params
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    cfg = F5Config(dim=32, depth=2, heads=4, head_dim=8, ff_mult=2,
                   text_dim=16, conv_layers=1, n_mels=20, vocab_size=16,
                   nfe_steps=4, max_signal_len=512, freq_embed_dim=16,
                   sample_rate=8000, n_fft=256, hop=64, win_length=256)
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=48,
                       num_layers=1, n_fft=256, hop=64, sample_rate=8000)
    params = init_params(cfg, jax.random.key(0))
    vparams = vocos_init(vcfg, jax.random.key(1))
    vocab = {" ": 0, "a": 1, "b": 2}

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(4000) * 3000).astype(np.int16)

    ref_pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg)
    ref_wav, _ = ref_pipe.synthesize(audio, "ab", "ba", seed=3)

    mesh = make_mesh(dp=1, tp=4)
    tp_pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg, mesh=mesh)
    tp_wav, _ = tp_pipe.synthesize(audio, "ab", "ba", seed=3)

    np.testing.assert_allclose(tp_wav.astype(np.int32),
                               ref_wav.astype(np.int32), atol=1)
