"""Fused DiT-block Pallas kernels vs the unfused XLA chains (interpret
mode on CPU) — the exact-path megakernel parity suite (VERDICT r1 item 2).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.nn.norm import layer_norm


def test_mlp_block_fused_matches_unfused():
    from tts_tpu.ops.dit_mlp import mlp_block_fused

    rng = np.random.default_rng(0)
    B, T, D, F = 2, 64, 128, 256
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    gate = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)

    n = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    h = jnp.matmul(n, w1) + b1
    h = jax.nn.gelu(h, approximate=True)
    ref = x + gate * (jnp.matmul(h, w2) + b2)

    mods = jnp.stack([shift, scale, gate])
    out = mlp_block_fused(x, mods, w1, b1, w2, b2, block_rows=32,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_mlp_block_fused_block_rows_fallback():
    """T not divisible by the requested block size falls back to a
    divisor."""
    from tts_tpu.ops.dit_mlp import mlp_block_fused

    rng = np.random.default_rng(1)
    B, T, D, F = 1, 48, 128, 128
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    z = jnp.zeros((D,))
    mods = jnp.stack([z, z, jnp.ones((D,))])
    out = mlp_block_fused(x, mods, w1, jnp.zeros(F), w2, jnp.zeros(D),
                          block_rows=32, interpret=True)
    n = layer_norm(x, eps=1e-6)
    ref = x + jnp.matmul(jax.nn.gelu(jnp.matmul(n, w1), approximate=True),
                         w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
