"""ops/decode_step.fused_qkv_attn (qkv head + GQA attention, one kernel)
vs the exact XLA chain it replaces (interpret mode on CPU), and the
qwen3_stack_step fused="step" routing vs fused=False."""
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
@pytest.mark.parametrize("pos_v", [0, 1, 37])
@pytest.mark.parametrize("bias,qknorm", [(False, True), (True, False)])
def test_fused_qkv_attn_matches_chain(quant, pos_v, bias, qknorm):
    from tts_tpu.ops.decode_step import fused_qkv_attn, qkv_attn_reference

    heads, kvh, hd, h_in, t, layers = 16, 8, 128, 1024, 64, 3
    layer = 1
    keys = jax.random.split(jax.random.key(0), 6)
    x = _rand(keys[0], (1, h_in), 0.1)
    w = _rand(keys[1], (h_in, (heads + 2 * kvh) * hd))
    kc = _rand(keys[2], (layers, 1, kvh, t, hd), 0.3)
    vc = _rand(keys[3], (layers, 1, kvh, t, hd), 0.3)
    qn = 1.0 + _rand(keys[4], (hd,)) if qknorm else None
    kn = 1.0 + _rand(keys[5], (hd,)) if qknorm else None
    bqkv = _rand(keys[4], ((heads + 2 * kvh) * hd,)) if bias else None
    cos, sin = rope_table(t + 4, hd)
    rc, rs = cos[pos_v:pos_v + 1], sin[pos_v:pos_v + 1]
    wq = quantize_int8(w) if quant else w
    pos = jnp.int32(pos_v)

    ref_a, ref_k, ref_v = qkv_attn_reference(
        x, wq, rc, rs, kc, vc, layer, pos, heads=heads, kv_heads=kvh,
        head_dim=hd, q_norm=qn, k_norm=kn, bqkv=bqkv)
    out_a, out_k, out_v = fused_qkv_attn(
        x, wq, rc, rs, kc, vc, layer, pos, heads=heads, kv_heads=kvh,
        head_dim=hd, q_norm=qn, k_norm=kn, bqkv=bqkv, interpret=True)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(ref_k),
                               atol=2e-5, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_v), np.asarray(ref_v),
                               atol=2e-5, rtol=2e-4)
    # attention reassociates the new-row PV term vs XLA's single dot:
    # ~1 fp32 ulp on fp32 activations
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(ref_a),
                               atol=3e-5, rtol=3e-4)


def test_stack_step_fused_step_matches_unfused():
    """fused="step" routing through qwen3_stack_step: a short decode run
    (prefill + 5 steps) must match fused=False to fp32 tolerance."""
    from tts_tpu.models.qwen_tts import Qwen3StackConfig, qwen3_stack_step

    cfg = Qwen3StackConfig(
        hidden_size=256, num_heads=16, num_kv_heads=8, head_dim=128,
        ffn_dim=512, num_layers=2, max_seq_len=64)
    key = jax.random.key(1)
    keys = jax.random.split(key, 8)
    hd = cfg.head_dim

    def layer_params(k):
        ks = jax.random.split(k, 6)
        return {
            "wqkv": _rand(ks[0], (cfg.hidden_size,
                                  (cfg.num_heads + 2 * cfg.num_kv_heads)
                                  * hd)),
            "wo": _rand(ks[1], (cfg.num_heads * hd, cfg.hidden_size)),
            "w_gate_up": _rand(ks[2], (cfg.hidden_size, 2 * cfg.ffn_dim)),
            "w_down": _rand(ks[3], (cfg.ffn_dim, cfg.hidden_size)),
            "q_norm": 1.0 + _rand(ks[4], (hd,)),
            "k_norm": 1.0 + _rand(ks[5], (hd,)),
        }

    params = {"layers": [layer_params(keys[i]) for i in range(2)]}
    cos, sin = rope_table(cfg.max_seq_len, hd)

    def run(fused):
        kv = KVCache.create(cfg.num_layers, 1, cfg.num_kv_heads,
                            cfg.max_seq_len, hd, jnp.float32)
        x = _rand(keys[6], (1, 3, cfg.hidden_size), 0.2)
        h, kv = qwen3_stack_step(params, x, kv, cfg, cos[:3], sin[:3])
        kv = kv.advance(3)
        outs = [h]
        for i in range(5):
            pos = 3 + i
            h, kv = qwen3_stack_step(
                params, h[:, None], kv, cfg, cos[pos:pos + 1],
                sin[pos:pos + 1], fused=fused, _interpret=True)
            kv = kv.advance(1)
            outs.append(h)
        return jnp.stack(outs)

    ref = run(False)
    out = run("step")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=5e-4)


def test_stack_step_fused_step_int8():
    """int8 weights through the fused="step" routing stay within the
    fused-vs-unfused kernel tolerance."""
    from tts_tpu.models.qwen_tts import Qwen3StackConfig, qwen3_stack_step

    cfg = Qwen3StackConfig(
        hidden_size=256, num_heads=16, num_kv_heads=8, head_dim=128,
        ffn_dim=512, num_layers=2, max_seq_len=32)
    keys = jax.random.split(jax.random.key(3), 3)

    def layer_params(k):
        ks = jax.random.split(k, 6)
        return {
            "wqkv": quantize_int8(_rand(
                ks[0], (cfg.hidden_size,
                        (cfg.num_heads + 2 * cfg.num_kv_heads)
                        * cfg.head_dim))),
            "wo": _rand(ks[1], (cfg.num_heads * cfg.head_dim,
                                cfg.hidden_size)),
            "w_gate_up": _rand(ks[2], (cfg.hidden_size, 2 * cfg.ffn_dim)),
            "w_down": _rand(ks[3], (cfg.ffn_dim, cfg.hidden_size)),
            "q_norm": 1.0 + _rand(ks[4], (cfg.head_dim,)),
            "k_norm": 1.0 + _rand(ks[5], (cfg.head_dim,)),
        }

    params = {"layers": [layer_params(keys[i]) for i in range(2)]}
    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim)

    def run(fused):
        kv = KVCache.create(cfg.num_layers, 1, cfg.num_kv_heads,
                            cfg.max_seq_len, cfg.head_dim, jnp.float32)
        x = _rand(keys[2], (1, 2, cfg.hidden_size), 0.2)
        h, kv = qwen3_stack_step(params, x, kv, cfg, cos[:2], sin[:2])
        kv = kv.advance(2)
        for i in range(3):
            pos = 2 + i
            h, kv = qwen3_stack_step(
                params, h[:, None], kv, cfg, cos[pos:pos + 1],
                sin[pos:pos + 1], fused=fused, _interpret=True)
            kv = kv.advance(1)
        return h

    np.testing.assert_allclose(
        np.asarray(run("step")), np.asarray(run(False)),
        atol=5e-5, rtol=5e-4)
