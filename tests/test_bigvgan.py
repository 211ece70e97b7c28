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
