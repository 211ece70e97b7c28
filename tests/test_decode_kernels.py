"""Fused AR-decode-layer Pallas kernels vs the unfused XLA chains
(interpret mode on CPU): ops/decode_qkv.fused_qkv_rope +
ops/decode_mlp.fused_out_mlp, and the full qwen3_stack_step fused=True
routing (bit-parity with fused=False at fp32)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.kv.cache import KVCache
from tts_tpu.nn.rope import rope_table
from tts_tpu.quant.weight_only import quantize_int8, quantize_pytree


def _rand(key, shape, s=0.05):
    return jax.random.normal(key, shape, jnp.float32) * s


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("b,a,h,f", [(1, 2048, 1024, 3072), (4, 512, 512, 1280)])
def test_fused_out_mlp_matches_chain(quant, b, a, h, f):
    from tts_tpu.ops.decode_mlp import fused_out_mlp, out_mlp_reference

    keys = jax.random.split(jax.random.key(0), 5)
    x = _rand(keys[0], (b, h), 0.1)
    att = _rand(keys[1], (b, a), 0.1)
    wo = _rand(keys[2], (a, h))
    wgu = _rand(keys[3], (h, 2 * f))
    wd = _rand(keys[4], (f, h))
    if quant:
        wo, wgu, wd = quantize_int8(wo), quantize_int8(wgu), quantize_int8(wd)

    ref = out_mlp_reference(x, att, wo, wgu, wd, eps=1e-6)
    out = fused_out_mlp(x, att, wo, wgu, wd, eps=1e-6, interpret=True)
    # fp32 block-partial accumulation reassociates the F-dim reduction;
    # tolerance matches the dit kernel suite (bf16 use has ~1e-2 ulps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=2e-4)


def test_fused_out_mlp_q8_matches_w8a8_reference():
    """W8A8 tail vs an op-for-op numpy-level W8A8 reference (per-row
    activation quantization, s8 x s8 int32 dots, group rescales)."""
    from tts_tpu.ops.decode_mlp import fused_out_mlp_q8

    b, a, h, f = 2, 512, 256, 384
    keys = jax.random.split(jax.random.key(11), 5)
    x = _rand(keys[0], (b, h), 0.1)
    att = _rand(keys[1], (b, a), 0.1)
    wo = quantize_int8(_rand(keys[2], (a, h)))
    wgu = quantize_int8(_rand(keys[3], (h, 2 * f)))
    wd = quantize_int8(_rand(keys[4], (f, h)))

    def rowq(v):
        s = jnp.maximum(jnp.max(jnp.abs(v), -1, keepdims=True), 1e-8) / 127.
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8), s

    aq, ats = rowq(att.astype(jnp.float32))
    y = jnp.matmul(aq.astype(jnp.int32), wo.q.astype(jnp.int32)
                   ).astype(jnp.float32) * ats * wo.scale
    x2 = x + y.astype(x.dtype)
    xf = x2.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, -1, keepdims=True) + 1e-6)
    hq, hs = rowq(n)
    gu = jnp.matmul(hq.astype(jnp.int32), wgu.q.astype(jnp.int32)
                    ).astype(jnp.float32) * hs * wgu.scale
    g, u = gu[:, :f], gu[:, f:]
    av = jax.nn.silu(g) * u
    vq, vs = rowq(av)   # single F block at this size -> per-row == per-block
    y2 = jnp.matmul(vq.astype(jnp.int32), wd.q.astype(jnp.int32)
                    ).astype(jnp.float32) * vs
    ref = x2 + (y2 * wd.scale).astype(x2.dtype)

    out = fused_out_mlp_q8(x, att, wo, wgu, wd, eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_out_mlp_rejects_mixed_quantization():
    from tts_tpu.ops.decode_mlp import fused_out_mlp

    keys = jax.random.split(jax.random.key(1), 4)
    x, att = _rand(keys[0], (1, 128)), _rand(keys[1], (1, 128))
    wo = quantize_int8(_rand(keys[2], (128, 128)))
    wgu = _rand(keys[3], (128, 256))
    wd = _rand(keys[3], (128, 128))
    with pytest.raises(ValueError):
        fused_out_mlp(x, att, wo, wgu, wd, interpret=True)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("norms,bias,hd", [(True, False, 128),
                                           (False, True, 128),
                                           (True, False, 64),
                                           (False, False, 64)])
def test_fused_qkv_rope_matches_chain(quant, norms, bias, hd):
    """hd=64 exercises the packed 2-heads-per-128-lane-row epilogue (the
    KaniTTS/VoxCPM geometry — Mosaic rejects sub-128-lane shape casts)."""
    from tts_tpu.ops.decode_qkv import fused_qkv_rope, qkv_rope_reference

    heads, kvh, hdim, b = 4, 2, 256, 2
    keys = jax.random.split(jax.random.key(2), 6)
    x = _rand(keys[0], (b, hdim), 0.1)
    w = _rand(keys[1], (hdim, (heads + 2 * kvh) * hd))
    qn = jnp.abs(_rand(keys[2], (hd,), 0.3)) if norms else None
    kn = jnp.abs(_rand(keys[3], (hd,), 0.3)) if norms else None
    bq = _rand(keys[4], ((heads + 2 * kvh) * hd,), 0.02) if bias else None
    cos, sin = rope_table(16, hd)
    cos, sin = jnp.asarray(cos[9:10]), jnp.asarray(sin[9:10])
    if quant:
        w = quantize_int8(w)

    kw = dict(heads=heads, kv_heads=kvh, head_dim=hd, q_norm=qn, k_norm=kn,
              bqkv=bq, eps=1e-6)
    ref = qkv_rope_reference(x, w, cos, sin, **kw)
    out = fused_qkv_rope(x, w, cos, sin, interpret=True, **kw)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("mode", [True, "all"])
@pytest.mark.parametrize("quant", [False, True])
def test_qwen_stack_step_fused_parity(quant, mode):
    """fused=True must match fused=False at fp32 to rounding noise
    (hidden AND the KV append), including multi-block accumulate paths."""
    from tts_tpu.models.qwen_tts import Qwen3StackConfig, init_stack_params, \
        qwen3_stack_step

    cfg = Qwen3StackConfig(hidden_size=256, num_heads=4, num_kv_heads=2,
                           head_dim=128, ffn_dim=384, num_layers=2,
                           max_seq_len=32)
    params = init_stack_params(cfg, jax.random.key(3))
    if quant:
        params = quantize_pytree(params, min_size=1)
    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)
    cos, sin = jnp.asarray(cos), jnp.asarray(sin)
    kv = KVCache.create(cfg.num_layers, 1, cfg.num_kv_heads,
                        cfg.max_seq_len, cfg.head_dim, jnp.float32)
    kv = kv.advance(5)
    x = _rand(jax.random.key(4), (1, 1, cfg.hidden_size), 0.1)

    h0, kv0 = qwen3_stack_step(params, x, kv, cfg, cos[5:6], sin[5:6])
    h1, kv1 = qwen3_stack_step(params, x, kv, cfg, cos[5:6], sin[5:6],
                               fused=mode, _interpret=True)
    # same math; only fp32 dot reassociation differs (~10 ulps across the
    # 2-layer chain)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1),
                               atol=5e-6, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(kv0.k), np.asarray(kv1.k),
                               atol=5e-6, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(kv0.v), np.asarray(kv1.v),
                               atol=5e-6, rtol=2e-5)


@pytest.mark.parametrize("quant", [False, True])
def test_fused_qkv_ln_no_rope_matches_chain(quant):
    """The IndexTTS GPT-2 layout: LayerNorm(w, b) prologue, biased qkv,
    MHA thirds, no rope, hd=64 (packed rows)."""
    from tts_tpu.ops.decode_qkv import fused_qkv_rope, qkv_rope_reference

    heads, hd, hdim, b = 4, 64, 256, 1
    keys = jax.random.split(jax.random.key(9), 6)
    x = _rand(keys[0], (b, hdim), 0.1)
    w = _rand(keys[1], (hdim, 3 * heads * hd))
    bq = _rand(keys[2], (3 * heads * hd,), 0.02)
    lw = 1.0 + _rand(keys[3], (hdim,), 0.1)
    lb = _rand(keys[4], (hdim,), 0.1)
    if quant:
        w = quantize_int8(w)

    kw = dict(heads=heads, kv_heads=heads, head_dim=hd, bqkv=bq,
              norm="ln", ln_weight=lw, ln_bias=lb, eps=1e-5)
    ref = qkv_rope_reference(x, w, **kw)
    out = fused_qkv_rope(x, w, interpret=True, **kw)
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("kv_len", [1, 5, 64, 100, 128, 200, 256])
def test_decode_attention_matches_dense(kv_len):
    """Clamped-read decode attention vs the dense masked gqa_attention,
    across block boundaries (block_kv=64 here; T=256 -> 4 blocks)."""
    from tts_tpu.nn.attention import attention_mask, gqa_attention
    from tts_tpu.ops.decode_attention import decode_gqa_attention

    b, heads, kvh, d, t = 2, 8, 2, 64, 256
    keys = jax.random.split(jax.random.key(7), 3)
    q = _rand(keys[0], (b, heads, d), 0.5)
    k = _rand(keys[1], (b, kvh, t, d), 0.5)
    v = _rand(keys[2], (b, kvh, t, d), 0.5)

    mask = attention_mask(1, t, kv_len - 1, kv_len, causal=True)
    ref = gqa_attention(q[:, None], k, v, mask)[:, 0]      # (b, heads, d)
    out = decode_gqa_attention(q, k, v, jnp.int32(kv_len), block_kv=64,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


def test_decode_attention_scale_and_blocks():
    from tts_tpu.nn.attention import attention_mask, gqa_attention
    from tts_tpu.ops.decode_attention import decode_gqa_attention

    b, heads, kvh, d, t = 1, 4, 4, 128, 128   # MHA case, single block
    keys = jax.random.split(jax.random.key(8), 3)
    q = _rand(keys[0], (b, heads, d), 0.5)
    k = _rand(keys[1], (b, kvh, t, d), 0.5)
    v = _rand(keys[2], (b, kvh, t, d), 0.5)
    mask = attention_mask(1, t, 99, 100, causal=True)
    ref = gqa_attention(q[:, None], k, v, mask, scale=0.125)[:, 0]
    out = decode_gqa_attention(q, k, v, jnp.int32(100), scale=0.125,
                               block_kv=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=2e-5)


def test_qwen_stack_step_fused_rejects_prefill():
    from tts_tpu.models.qwen_tts import Qwen3StackConfig, init_stack_params, \
        qwen3_stack_step

    cfg = Qwen3StackConfig(hidden_size=128, num_heads=2, num_kv_heads=1,
                           head_dim=64, ffn_dim=128, num_layers=1,
                           max_seq_len=8)
    params = init_stack_params(cfg, jax.random.key(5))
    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim)
    kv = KVCache.create(1, 1, 1, cfg.max_seq_len, cfg.head_dim, jnp.float32)
    x = _rand(jax.random.key(6), (1, 2, cfg.hidden_size))
    with pytest.raises(ValueError):
        qwen3_stack_step(params, x, kv, cfg, jnp.asarray(cos[:2]),
                         jnp.asarray(sin[:2]), fused=True)


def test_fused_auto_degrades_on_unpackable_layout():
    """A head geometry the kernel cannot pack into 128-lane rows (hd=12)
    must fall back to the XLA path under fused=True — same outputs, no
    error (ops/decode_qkv.fusable_layout; the auto-on TPU default would
    otherwise crash tiny configs)."""
    from tts_tpu.models.qwen_tts import Qwen3StackConfig, init_stack_params, \
        qwen3_stack_step
    from tts_tpu.ops.decode_qkv import fusable_layout

    assert not fusable_layout(1, 2, 1, 12)
    assert fusable_layout(1, 16, 2, 64)       # VoxCPM geometry packs
    assert fusable_layout(1, 16, 8, 128)      # Qwen talker geometry

    cfg = Qwen3StackConfig(hidden_size=24, num_heads=2, num_kv_heads=1,
                           head_dim=12, ffn_dim=48, num_layers=1,
                           max_seq_len=8)
    params = init_stack_params(cfg, jax.random.key(7))
    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim)
    x = _rand(jax.random.key(8), (1, 1, cfg.hidden_size))

    def run(fused):
        kv = KVCache.create(1, 1, 1, cfg.max_seq_len, cfg.head_dim,
                            jnp.float32)
        h, _ = qwen3_stack_step(params, x, kv, cfg, jnp.asarray(cos[:1]),
                                jnp.asarray(sin[:1]), fused=fused,
                                _interpret=True)
        return np.asarray(h)

    np.testing.assert_array_equal(run(True), run(False))
