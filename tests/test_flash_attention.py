"""Pallas flash attention vs the einsum reference, run in interpreter mode
so CI needs no TPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tts_tpu.ops.flash_attention import flash_attention


def _ref(q, k, v, kv_len, scale):
    s = q.shape[2]
    sc = jnp.einsum("bhsd,bhtd->bhst", q, k,
                    preferred_element_type=jnp.float32) * scale
    mask = jnp.arange(s) < kv_len
    sc = jnp.where(mask[None, None, None], sc, -1e30)
    return jnp.einsum("bhst,bhtd->bhsd", jax.nn.softmax(sc, -1), v)


@pytest.mark.parametrize("kv_len", [256, 150])
@pytest.mark.parametrize("block_kv", [128, 256])
def test_flash_matches_reference(kv_len, block_kv):
    b, h, s, d = 1, 2, 256, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    scale = d ** -0.5
    gold = np.asarray(_ref(q, k, v, kv_len, scale))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, jnp.int32(kv_len),
                                         scale=scale, block_q=128,
                                         block_kv=block_kv))
    np.testing.assert_allclose(out, gold, atol=2e-5)


@pytest.mark.parametrize("kv_len", [256, 150])
@pytest.mark.parametrize("head_block", [1, 2])
def test_flash_onepass_matches_reference(kv_len, head_block):
    """block_kv == s takes the single-pass kernel (no online-softmax
    scratch) with `head_block` heads batched per grid program."""
    b, h, s, d = 1, 2, 256, 64
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    scale = d ** -0.5
    gold = np.asarray(_ref(q, k, v, kv_len, scale))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(flash_attention(q, k, v, jnp.int32(kv_len),
                                         scale=scale, block_q=128,
                                         block_kv=s, head_block=head_block))
    np.testing.assert_allclose(out, gold, atol=2e-5)


def test_flash_rejects_bad_blocks():
    q = jnp.zeros((1, 1, 100, 64))
    with pytest.raises(ValueError):
        flash_attention(q, q, q, block_q=64, block_kv=64)


def test_flash_packed_out_matches_transpose():
    """packed_out=True returns (B, S, H*D) equal to the standard output
    transposed+reshaped."""
    import jax.numpy as jnp

    from tts_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(9)
    B, H, S, D = 2, 4, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention(q, k, v, jnp.int32(50), block_q=32,
                              block_kv=S, head_block=2)
        out = flash_attention(q, k, v, jnp.int32(50), block_q=32,
                              block_kv=S, head_block=2, packed_out=True)
    ref = np.asarray(ref).transpose(0, 2, 1, 3).reshape(B, S, H * D)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("kv_len", [256, 150])
def test_flash_flat_matches_rope_chain(kv_len):
    """flash_attention_flat (flat qkv in, in-kernel RoPE, packed out) ==
    the existing _rope_qkv_flat -> flash_attention(packed_out) chain.
    Same fp32 rope math, same per-head dots, same one-pass exp2 softmax —
    outputs must match to fp32 dot tolerance."""
    from tts_tpu.models.f5 import _rope_qkv_flat
    from tts_tpu.ops.flash_attention import flash_attention_flat

    b, h, s, d = 2, 4, 256, 64
    rng = np.random.default_rng(3)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)), jnp.float32)
    theta = 10000.0 ** (-np.arange(0, d // 2) / (d // 2))
    ang = np.arange(s)[:, None] * theta[None, :]
    cos = jnp.asarray(np.tile(np.cos(ang), (1, 2)), jnp.float32)  # (s, d)
    sin = jnp.asarray(np.tile(np.sin(ang), (1, 2)), jnp.float32)

    q, k, v = _rope_qkv_flat(qkv, cos, sin, h, d)
    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention(q, k, v, jnp.int32(kv_len), block_q=128,
                              block_kv=s, head_block=2, packed_out=True)
        out = flash_attention_flat(qkv, cos, sin, jnp.int32(kv_len),
                                   heads=h, block_q=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_flat_autopicked_large_block_q():
    """ADVICE r4: the auto block_q picker selects >128 at the F5 bench
    length (t=1408) — exercise that exact configuration in interpret
    mode (was only covered at t=256/block_q=128) and pin it against the
    rope-chain reference."""
    from tts_tpu.models.f5 import _rope_qkv_flat
    from tts_tpu.ops.flash_attention import flash_attention_flat

    b, h, s, d = 1, 2, 1408, 64
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)) * 0.2,
                      jnp.float32)
    theta = 10000.0 ** (-np.arange(0, d // 2) / (d // 2))
    ang = np.arange(s)[:, None] * theta[None, :]
    cos = jnp.asarray(np.tile(np.cos(ang), (1, 2)), jnp.float32)
    sin = jnp.asarray(np.tile(np.sin(ang), (1, 2)), jnp.float32)

    q, k, v = _rope_qkv_flat(qkv, cos, sin, h, d)
    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention(q, k, v, jnp.int32(1200), block_q=128,
                              block_kv=s, head_block=2, packed_out=True)
        out = flash_attention_flat(qkv, cos, sin, jnp.int32(1200),
                                   heads=h)        # block_q auto-picked
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("kv_split", [2, 3])
def test_flash_flat_kv_split_matches_default(kv_split):
    """Opt-in kv_split chunking (independent exp2 per 128-aligned kv
    chunk, benchmarks/flash_ablation.py kvsplitN): reassociates only the
    fp32 denominator/PV sums — must match kv_split=1 to fp32-sum
    tolerance, including at a T that does not chunk evenly (384/3=128
    even; 384/2 uneven edges 256+128)."""
    from tts_tpu.ops.flash_attention import flash_attention_flat

    b, h, s, d = 1, 2, 384, 64
    rng = np.random.default_rng(7)
    qkv = jnp.asarray(rng.standard_normal((b, s, 3 * h * d)) * 0.3,
                      jnp.float32)
    theta = 10000.0 ** (-np.arange(0, d // 2) / (d // 2))
    ang = np.arange(s)[:, None] * theta[None, :]
    cos = jnp.asarray(np.tile(np.cos(ang), (1, 2)), jnp.float32)
    sin = jnp.asarray(np.tile(np.sin(ang), (1, 2)), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        ref = flash_attention_flat(qkv, cos, sin, jnp.int32(300), heads=h,
                                   block_q=128)
        out = flash_attention_flat(qkv, cos, sin, jnp.int32(300), heads=h,
                                   block_q=128, kv_split=kv_split)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
