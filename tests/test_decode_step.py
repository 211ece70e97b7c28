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
        # qwen3_stack_step advances kv.length internally — no extra
        # advance here, so decode steps write the contiguous rows the
        # kernel's parked-block/pos contract is built around
        h, kv = qwen3_stack_step(params, x, kv, cfg, cos[:3], sin[:3])
        outs = [h]
        for i in range(5):
            pos = 3 + i
            h, kv = qwen3_stack_step(
                params, h[:, None], kv, cfg, cos[pos:pos + 1],
                sin[pos:pos + 1], fused=fused, _interpret=True)
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
        # stack_step advances internally (see the bf16 test above)
        h, kv = qwen3_stack_step(params, x, kv, cfg, cos[:2], sin[:2])
        for i in range(3):
            pos = 2 + i
            h, kv = qwen3_stack_step(
                params, h[:, None], kv, cfg, cos[pos:pos + 1],
                sin[pos:pos + 1], fused=fused, _interpret=True)
        return h

    np.testing.assert_allclose(
        np.asarray(run("step")), np.asarray(run(False)),
        atol=5e-5, rtol=5e-4)


@pytest.mark.parametrize("quant", [False, True])
@pytest.mark.parametrize("geom", [
    (16, 8, 64, True),    # Kani: GQA hd=64, q/k norms + rope
    (16, 2, 64, False),   # VoxCPM: GQA g=8 hd=64, rope only
])
def test_fused_qkv_attn_hd64(quant, geom):
    """hd=64 packed layouts (2 heads per 128-lane row): the epilogue
    unpack/attend/pack must match the XLA chain."""
    from tts_tpu.ops.decode_step import fused_qkv_attn, qkv_attn_reference

    heads, kvh, hd, qknorm = geom
    h_in, t, layers, layer, pos_v = 512, 32, 2, 0, 9
    keys = jax.random.split(jax.random.key(5), 6)
    x = _rand(keys[0], (1, h_in), 0.1)
    w = _rand(keys[1], (h_in, (heads + 2 * kvh) * hd))
    kc = _rand(keys[2], (layers, 1, kvh, t, hd), 0.3)
    vc = _rand(keys[3], (layers, 1, kvh, t, hd), 0.3)
    qn = 1.0 + _rand(keys[4], (hd,)) if qknorm else None
    kn = 1.0 + _rand(keys[5], (hd,)) if qknorm else None
    cos, sin = rope_table(t + 4, hd)
    rc, rs = cos[pos_v:pos_v + 1], sin[pos_v:pos_v + 1]
    wq = quantize_int8(w) if quant else w
    pos = jnp.int32(pos_v)

    ref = qkv_attn_reference(
        x, wq, rc, rs, kc, vc, layer, pos, heads=heads, kv_heads=kvh,
        head_dim=hd, q_norm=qn, k_norm=kn)
    out = fused_qkv_attn(
        x, wq, rc, rs, kc, vc, layer, pos, heads=heads, kv_heads=kvh,
        head_dim=hd, q_norm=qn, k_norm=kn, interpret=True)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=3e-5, rtol=3e-4)


def test_fused_qkv_attn_ln_norope():
    """IndexTTS GPT-2 geometry: MHA (kvh == heads), hd=64, LayerNorm
    with weights/bias, qkv bias, NO rope."""
    from tts_tpu.ops.decode_step import fused_qkv_attn, qkv_attn_reference

    heads = kvh = 20
    hd, h_in, t, layer, pos_v = 64, 1280, 64, 1, 17
    keys = jax.random.split(jax.random.key(9), 7)
    x = _rand(keys[0], (1, h_in), 0.1)
    w = _rand(keys[1], (h_in, 3 * heads * hd))
    kc = _rand(keys[2], (3, 1, kvh, t, hd), 0.3)
    vc = _rand(keys[3], (3, 1, kvh, t, hd), 0.3)
    bqkv = _rand(keys[4], (3 * heads * hd,))
    lnw = 1.0 + _rand(keys[5], (h_in,))
    lnb = _rand(keys[6], (h_in,))
    pos = jnp.int32(pos_v)

    ref = qkv_attn_reference(
        x, w, None, None, kc, vc, layer, pos, heads=heads, kv_heads=kvh,
        head_dim=hd, bqkv=bqkv, norm="ln", ln_weight=lnw, ln_bias=lnb,
        eps=1e-5)
    out = fused_qkv_attn(
        x, w, None, None, kc, vc, layer, pos, heads=heads, kv_heads=kvh,
        head_dim=hd, bqkv=bqkv, norm="ln", ln_weight=lnw, ln_bias=lnb,
        eps=1e-5, interpret=True)
    for o, r in zip(out, ref):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   atol=3e-5, rtol=3e-4)


def test_kani_step_fused_step_matches_unfused():
    """kani_step fused="step" routing (hd=64 GQA + conv interleave) vs
    fused=False."""
    from jax.experimental.pallas import tpu as pltpu

    from tts_tpu.models.kani import (KaniConfig, embed_tokens, init_params,
                                     init_state, kani_step)

    cfg = KaniConfig(hidden_size=128, num_heads=16, num_kv_heads=8,
                     head_dim=64, ffn_dim=192, vocab_size=64,
                     layer_types=("conv", "attn", "conv", "attn"),
                     max_seq_len=64, stop_token=-1)
    params = init_params(cfg, jax.random.key(0))
    ids = jnp.array([[3, 9, 4]], jnp.int32)

    def run(fused):
        state = init_state(cfg, 1, jnp.float32)
        x = embed_tokens(params, ids)
        logits, state = kani_step(params, x, state, cfg)
        outs = [logits]
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        for _ in range(4):
            x = embed_tokens(params, tok[:, None])
            with pltpu.force_tpu_interpret_mode():
                logits, state = kani_step(params, x, state, cfg,
                                          fused=fused)
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            outs.append(logits)
        return jnp.stack(outs)

    np.testing.assert_allclose(np.asarray(run("step")),
                               np.asarray(run(False)),
                               atol=5e-5, rtol=5e-4)


def test_llama_stack_fused_step_matches_unfused():
    """VoxCPM llama_stack_step fused="step" (hd=64, kvh=2, rope only) vs
    fused=False."""
    from jax.experimental.pallas import tpu as pltpu

    from tts_tpu.models.voxcpm import (LlamaStackConfig,
                                       _init_llama_stack, llama_stack_step)
    from tts_tpu.nn.rope import rope_table

    cfg = LlamaStackConfig(hidden_size=128, num_heads=16, num_kv_heads=2,
                           head_dim=64, ffn_dim=192, num_layers=2,
                           max_seq_len=64)
    params = _init_llama_stack(cfg, jax.random.key(2))
    cos, sin = rope_table(cfg.max_seq_len, cfg.head_dim, cfg.rope_base)

    def run(fused):
        kv = KVCache.create(cfg.num_layers, 1, cfg.num_kv_heads,
                            cfg.max_seq_len, cfg.head_dim, jnp.float32)
        x = _rand(jax.random.key(3), (1, 3, cfg.hidden_size), 0.2)
        h, kv = llama_stack_step(params, x, kv, cfg, cos[:3], sin[:3])
        outs = [h]
        cur = h[:, -1:]
        for i in range(4):
            pos = 3 + i
            with pltpu.force_tpu_interpret_mode():
                h, kv = llama_stack_step(
                    params, cur, kv, cfg, cos[pos:pos + 1],
                    sin[pos:pos + 1], fused=fused)
            cur = h[:, -1:]
            outs.append(h)
        return jnp.concatenate([o.reshape(-1) for o in outs])

    np.testing.assert_allclose(np.asarray(run("step")),
                               np.asarray(run(False)),
                               atol=5e-5, rtol=5e-4)


def test_gpt_step_fused_step_matches_unfused():
    """IndexTTS gpt_step fused="step" (MHA hd=64, LN, bias, no rope) vs
    fused=False."""
    from jax.experimental.pallas import tpu as pltpu

    from tts_tpu.models.indextts import (IndexTTSConfig, gpt_step,
                                         init_gpt_params)

    cfg = IndexTTSConfig(gpt_dim=256, gpt_heads=4, gpt_layers=2,
                         num_mel_codes=32, max_seq_len=64)
    assert cfg.gpt_head_dim == 64
    params = init_gpt_params(cfg, jax.random.key(4))
    pen = jnp.ones((1, cfg.num_mel_codes), jnp.float32)

    def run(fused):
        kv = KVCache.create(cfg.gpt_layers, 1, cfg.gpt_heads,
                            cfg.max_seq_len, cfg.gpt_head_dim, jnp.float32)
        x = _rand(jax.random.key(5), (1, 3, cfg.gpt_dim), 0.2)
        logits, h, kv = gpt_step(params, x, kv, pen, cfg)
        outs = [logits]
        for _ in range(4):
            with pltpu.force_tpu_interpret_mode():
                logits, h, kv = gpt_step(params, h[:, None], kv, pen, cfg,
                                         fused=fused)
            outs.append(logits)
        return jnp.stack(outs)

    np.testing.assert_allclose(np.asarray(run("step")),
                               np.asarray(run(False)),
                               atol=5e-5, rtol=5e-4)


def test_fused_step_degrades_on_batched_rows():
    """fused="step" with B>1 (batched serving rows) must degrade to the
    qkv-head routing and produce identical results to fused=False —
    the gate, not the kernel, is under test (CPU, no interpret needed
    because the degraded path is pure XLA at B>1 only when the qkv
    kernel also rejects; force that with a non-packable layout)."""
    from tts_tpu.models.qwen_tts import Qwen3StackConfig, qwen3_stack_step

    # head layout NOT packable into 128-lane rows (3 heads x 16) ->
    # fusable_layout False -> fused degrades all the way to XLA
    cfg = Qwen3StackConfig(
        hidden_size=48, num_heads=3, num_kv_heads=3, head_dim=16,
        ffn_dim=96, num_layers=2, max_seq_len=32)
    keys = jax.random.split(jax.random.key(7), 3)

    def layer_params(k):
        ks = jax.random.split(k, 6)
        return {
            "wqkv": _rand(ks[0], (cfg.hidden_size, 9 * 16)),
            "wo": _rand(ks[1], (48, cfg.hidden_size)),
            "w_gate_up": _rand(ks[2], (cfg.hidden_size, 2 * cfg.ffn_dim)),
            "w_down": _rand(ks[3], (cfg.ffn_dim, cfg.hidden_size)),
            "q_norm": 1.0 + _rand(ks[4], (16,)),
            "k_norm": 1.0 + _rand(ks[5], (16,)),
        }

    params = {"layers": [layer_params(keys[i]) for i in range(2)]}
    cos, sin = rope_table(cfg.max_seq_len, 16)

    def run(fused):
        kv = KVCache.create(cfg.num_layers, 2, cfg.num_kv_heads,
                            cfg.max_seq_len, 16, jnp.float32)
        x = _rand(keys[2], (2, 1, cfg.hidden_size), 0.2)
        kv = kv.advance(3)
        h, kv = qwen3_stack_step(params, x, kv, cfg, cos[3:4], sin[3:4],
                                 fused=fused)
        return h

    np.testing.assert_array_equal(np.asarray(run("step")),
                                  np.asarray(run(False)))
