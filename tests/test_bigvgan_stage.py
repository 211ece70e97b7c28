"""Fused AMP resblock kernel (ops/bigvgan_stage.py) vs the XLA chain
(models/bigvgan._amp_block with the phase-space activation), run through
the Pallas interpreter on CPU — identical math modulo the documented
rounding differences (fp32 act with one rounding vs per-op bf16; fp32
dot accumulation)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_tpu.audio.filters import AliasFreeResample
from tts_tpu.models.bigvgan import BigVGANConfig, _amp_block
from tts_tpu.ops.bigvgan_stage import amp_block_fused, fusable_stage


def _params(rng, k, n_br, c):
    def conv(shape):
        return jnp.asarray(rng.standard_normal(shape) * 0.05, jnp.float32)

    return {
        "convs1": [{"w": conv((k, c, c)), "b": conv((c,))}
                   for _ in range(n_br)],
        "convs2": [{"w": conv((k, c, c)), "b": conv((c,))}
                   for _ in range(n_br)],
        "acts1": [{"alpha": 1 + jnp.asarray(rng.uniform(0, 1, c),
                                            jnp.float32),
                   "beta_recip": jnp.asarray(rng.uniform(0.5, 1.5, c),
                                             jnp.float32)}
                  for _ in range(n_br)],
        "acts2": [{"alpha": 1 + jnp.asarray(rng.uniform(0, 1, c),
                                            jnp.float32),
                   "beta_recip": jnp.asarray(rng.uniform(0.5, 1.5, c),
                                             jnp.float32)}
                  for _ in range(n_br)],
    }


def _stacked(p):
    g = lambda key, sub: jnp.stack([br[sub] for br in p[key]])
    return (g("convs1", "w"), g("convs1", "b"),
            g("convs2", "w"), g("convs2", "b"),
            g("acts1", "alpha"), g("acts1", "beta_recip"),
            g("acts2", "alpha"), g("acts2", "beta_recip"))


@pytest.mark.parametrize("k,dils,t,c", [
    (11, (1, 3, 5), 800, 24),
    (7, (1, 3, 5), 530, 48),
    (3, (1, 3, 5), 300, 16),
    (3, (1, 2), 300, 16),          # AMPBlock-ish alt dilation set
])
def test_fused_matches_xla_chain(k, dils, t, c):
    rng = np.random.default_rng(k + t)
    cfg = BigVGANConfig(activation="snakebeta",
                        resblock_kernel_sizes=(k,),
                        resblock_dilation_sizes=(tuple(dils),))
    p = _params(rng, k, len(dils), c)
    x = jnp.asarray(rng.standard_normal((1, t, c)) * 0.5, jnp.float32)

    ref = _amp_block(x, p, k, dils, cfg, AliasFreeResample(2))
    out = amp_block_fused(x, *_stacked(p), k=k, dils=tuple(dils),
                          interpret=True)
    assert out.shape == ref.shape
    err = float(jnp.abs(out - ref).max())
    assert err < 1e-5, err


def test_fused_batch_rows_independent():
    rng = np.random.default_rng(0)
    k, dils, t, c = 3, (1, 3), 260, 16
    p = _params(rng, k, len(dils), c)
    xb = jnp.asarray(rng.standard_normal((2, t, c)) * 0.5, jnp.float32)
    out_b = amp_block_fused(xb, *_stacked(p), k=k, dils=dils,
                            interpret=True)
    for i in range(2):
        out_1 = amp_block_fused(xb[i:i + 1], *_stacked(p), k=k, dils=dils,
                                interpret=True)
        np.testing.assert_array_equal(np.asarray(out_b[i]),
                                      np.asarray(out_1[0]))


def test_fusable_stage_gate():
    assert fusable_stage(24, 131072, jnp.bfloat16)
    assert fusable_stage(128, 16384, jnp.float32)
    assert not fusable_stage(192, 16384, jnp.float32)   # fp32 wt > VMEM
    assert not fusable_stage(768, 2048, jnp.bfloat16)   # weights > VMEM
    assert not fusable_stage(24, 100, jnp.bfloat16)     # tiny T
    assert not fusable_stage(24, 131072, jnp.float16)


def test_bigvgan_apply_fused_matches_xla(monkeypatch):
    """Full generator with the fused resblock path (forced on through
    the interpreter) vs the pure-XLA path — small config whose stages
    all pass the fusable gate."""
    from tts_tpu.models import bigvgan as bv

    cfg = BigVGANConfig(
        num_mels=8, upsample_initial_channel=32,
        upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        use_tanh_at_final=True, use_bias_at_final=True)
    params = bv.init_params(cfg, jax.random.key(0))
    mel = jnp.asarray(np.random.default_rng(1).standard_normal((1, 130, 8)),
                      jnp.float32)

    ref = bv.bigvgan_apply(params, mel, cfg, fused=False)

    orig = bv._amp_block_kernel
    monkeypatch.setattr(
        bv, "_amp_block_kernel",
        lambda x, p, k, d, c: orig(x, p, k, d, c, interpret=True))
    out = bv.bigvgan_apply(params, mel, cfg, fused=True)
    assert out.shape == ref.shape
    assert float(jnp.abs(out - ref).max()) < 1e-5


def test_geometry_guards_raise():
    """Public-entry geometries whose taps would escape the staging
    margin or halo must error loudly, not silently corrupt output."""
    rng = np.random.default_rng(0)
    k, c, t = 11, 16, 512
    p = _params(rng, k, 3, c)
    x = jnp.asarray(rng.standard_normal((1, t, c)) * 0.5, jnp.float32)
    with pytest.raises(ValueError, match="staging margin"):
        amp_block_fused(x, *_stacked(p), k=k, dils=(1, 3, 7),
                        interpret=True)
    p4 = _params(rng, k, 4, c)
    with pytest.raises(ValueError, match="halo"):
        amp_block_fused(x, *_stacked(p4), k=k, dils=(5, 5, 5, 5),
                        interpret=True)
