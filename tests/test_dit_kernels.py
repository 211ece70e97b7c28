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


def test_rope_qkv_flat_matches_per_head():
    """The flat-rope TPU path (two rolls + lane mask over the fused qkv)
    must reproduce the per-head _apply_rope_hs exactly."""
    from tts_tpu.models.f5 import (_apply_rope_hs, _rope_qkv_flat,
                                   f5_rope_tables)

    rng = np.random.default_rng(2)
    B, T, H, D = 2, 16, 4, 8
    qkv = jnp.asarray(rng.standard_normal((B, T, 3 * H * D)), jnp.float32)
    cos, sin = f5_rope_tables(T, D)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)

    q, k, v = _rope_qkv_flat(qkv, cos, sin, H, D)

    qr, kr, vr = jnp.split(qkv, 3, axis=-1)
    qr = _apply_rope_hs(qr.reshape(B, T, H, D), cos, sin).transpose(0, 2, 1, 3)
    kr = _apply_rope_hs(kr.reshape(B, T, H, D), cos, sin).transpose(0, 2, 1, 3)
    vr = vr.reshape(B, T, H, D).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(np.asarray(q), np.asarray(qr))
    np.testing.assert_array_equal(np.asarray(k), np.asarray(kr))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))


def test_mlp_block_fused_t1024_block_rows_176():
    """Regression: T=1024 with the default block_rows=176 must pick an
    8-multiple divisor (128), not collapse to 2 (which violates the TPU
    sublane block minimum — crashed the real pipeline at 4 s references)."""
    from tts_tpu.ops.dit_mlp import mlp_block_fused

    rng = np.random.default_rng(2)
    B, T, D, F = 1, 1024, 128, 128
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    z = jnp.zeros((D,))
    mods = jnp.stack([z, z, jnp.ones((D,))])
    out = mlp_block_fused(x, mods, w1, jnp.zeros(F), w2, jnp.zeros(D),
                          block_rows=176, interpret=True)
    n = layer_norm(x, eps=1e-6)
    ref = x + jnp.matmul(jax.nn.gelu(jnp.matmul(n, w1), approximate=True), w2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def _q8_ref_dense(nf, w_q, w_scale):
    """Emulate the in-kernel W8A8 matmul in plain fp32: per-row symmetric
    activation quantization then the int8 dot (exact in fp32 at these
    sizes: |acc| <= 127*127*K < 2^24)."""
    amax = jnp.max(jnp.abs(nf), axis=-1, keepdims=True)
    xs = jnp.maximum(amax, 1e-8) / 127.0
    nq = jnp.clip(jnp.round(nf / xs), -127, 127)
    return jnp.matmul(nq, w_q.astype(jnp.float32)) * xs * w_scale


def test_mlp_block_fused_q8_matches_reference_chain():
    from tts_tpu.ops.dit_mlp import mlp_block_fused_q8
    from tts_tpu.quant.weight_only import quantize_int8

    rng = np.random.default_rng(3)
    B, T, D, F = 2, 64, 128, 256
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(F) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    gate = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    q1, q2 = quantize_int8(w1), quantize_int8(w2)

    n = (layer_norm(x, eps=1e-6) * (1 + scale) + shift).astype(jnp.float32)
    h = _q8_ref_dense(n, q1.q, q1.scale) + b1
    h = jax.nn.gelu(h, approximate=True)
    y = _q8_ref_dense(h, q2.q, q2.scale) + b2
    ref = x + gate * y

    mods = jnp.stack([shift, scale, gate])
    out = mlp_block_fused_q8(x, mods, q1.q, q1.scale, b1, q2.q, q2.scale,
                             b2, block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_ln_qkv_q8_matches_reference_chain():
    from tts_tpu.ops.quant_matmul import ln_qkv_q8
    from tts_tpu.quant.weight_only import quantize_int8

    rng = np.random.default_rng(4)
    B, T, D, N = 2, 64, 128, 384
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, N)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(N) * 0.1, jnp.float32)
    shift = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    qw = quantize_int8(w)

    n = (layer_norm(x, eps=1e-6) * (1 + scale) + shift).astype(jnp.float32)
    ref = _q8_ref_dense(n, qw.q, qw.scale) + b

    out = ln_qkv_q8(x, jnp.stack([shift, scale]), qw.q, qw.scale, b,
                    block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_out_proj_residual_q8_matches_reference_chain():
    from tts_tpu.ops.quant_matmul import out_proj_residual_q8
    from tts_tpu.quant.weight_only import quantize_int8

    rng = np.random.default_rng(5)
    B, T, HD, D = 2, 64, 256, 128
    o = jnp.asarray(rng.standard_normal((B, T, HD)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((HD, D)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    gate = jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)
    qw = quantize_int8(w)

    ref = x + gate * (_q8_ref_dense(o, qw.q, qw.scale) + b)

    out = out_proj_residual_q8(o, qw.q, qw.scale, b, gate, x,
                               block_rows=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_mlp_block_fused_per_row_mods():
    """(B, 3, D) per-row modulation (continuous F5 serving: each request
    at its own NFE step) matches the per-row XLA chain."""
    from tts_tpu.ops.dit_mlp import mlp_block_fused

    rng = np.random.default_rng(5)
    B, T, D, F = 3, 32, 128, 256
    x = jnp.asarray(rng.standard_normal((B, T, D)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((D, F)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, D)) * 0.05, jnp.float32)
    mods = jnp.asarray(rng.standard_normal((B, 3, D)) * 0.1, jnp.float32)

    shift, scale, gate = mods[:, 0, None], mods[:, 1, None], mods[:, 2, None]
    n = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    h = jax.nn.gelu(jnp.matmul(n, w1), approximate=True)
    ref = x + gate * jnp.matmul(h, w2)

    out = mlp_block_fused(x, mods, w1, jnp.zeros(F), w2, jnp.zeros(D),
                          block_rows=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
