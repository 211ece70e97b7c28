"""Per-family checkpoint loaders: key mapping and fusion algebra validated
on synthetic state dicts in the upstream layouts (no real checkpoints exist
in this environment)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _rng():
    return np.random.default_rng(0)


def test_kani_loader_fold_algebra():
    """operator_norm folded into qkv must equal matmul-by-folded == norm
    then matmul-by-raw for unit-rms inputs with weight applied."""
    from tts_tpu.models.kani import KaniConfig, embed_tokens, init_state, kani_step
    from tts_tpu.weights.kani_loader import kani_params_from_state_dict

    cfg = KaniConfig(
        hidden_size=16, num_heads=2, num_kv_heads=1, head_dim=8, ffn_dim=32,
        vocab_size=32, layer_types=("conv", "attn"), max_seq_len=32,
        stop_token=31,
    )
    r = _rng()

    def w(*s):
        return r.standard_normal(s).astype(np.float32) * 0.1

    hs, hd = cfg.hidden_size, cfg.head_dim
    sd = {
        "model.embed_tokens.weight": w(cfg.vocab_size, hs),
        "model.embedding_norm.weight": np.abs(w(hs)) + 0.5,
        "lm_head.weight": w(cfg.vocab_size, hs),
    }
    for i, lt in enumerate(cfg.layer_types):
        p = f"model.layers.{i}"
        sd[f"{p}.operator_norm.weight"] = np.abs(w(hs)) + 0.5
        sd[f"{p}.ffn_norm.weight"] = np.abs(w(hs)) + 0.5
        sd[f"{p}.feed_forward.w1.weight"] = w(cfg.ffn_dim, hs)
        sd[f"{p}.feed_forward.w2.weight"] = w(hs, cfg.ffn_dim)
        sd[f"{p}.feed_forward.w3.weight"] = w(cfg.ffn_dim, hs)
        if lt == "attn":
            sd[f"{p}.self_attn.q_proj.weight"] = w(cfg.num_heads * hd, hs)
            sd[f"{p}.self_attn.k_proj.weight"] = w(cfg.num_kv_heads * hd, hs)
            sd[f"{p}.self_attn.v_proj.weight"] = w(cfg.num_kv_heads * hd, hs)
            sd[f"{p}.self_attn.out_proj.weight"] = w(hs, cfg.num_heads * hd)
            sd[f"{p}.self_attn.q_layernorm.weight"] = np.abs(w(hd)) + 0.5
            sd[f"{p}.self_attn.k_layernorm.weight"] = np.abs(w(hd)) + 0.5
        else:
            sd[f"{p}.conv.in_proj.weight"] = w(3 * hs, hs)
            sd[f"{p}.conv.conv.weight"] = w(hs, 1, cfg.conv_kernel)
            sd[f"{p}.conv.out_proj.weight"] = w(hs, hs)

    params = kani_params_from_state_dict(sd, cfg)
    # fold check: wqkv column block for q == (q_proj * op_norm).T
    op = sd["model.layers.1.operator_norm.weight"][None, :]
    expect_q = (sd["model.layers.1.self_attn.q_proj.weight"] * op).T
    got = np.asarray(params["layers"][1]["wqkv"])[:, : cfg.num_heads * hd]
    np.testing.assert_allclose(got, expect_q, atol=1e-6)
    # the mapped params must run
    state = init_state(cfg, kv_dtype=jnp.float32)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    logits, _ = kani_step(params, embed_tokens(params, ids), state, cfg)
    assert logits.shape == (1, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()


def test_qwen_stack_loader_runs():
    from tts_tpu.kv.cache import KVCache
    from tts_tpu.models.qwen_tts import Qwen3StackConfig, qwen3_stack_step
    from tts_tpu.weights.qwen_loader import qwen3_stack_from_state_dict

    cfg = Qwen3StackConfig(hidden_size=16, num_heads=2, num_kv_heads=1,
                           head_dim=8, ffn_dim=32, num_layers=2,
                           max_seq_len=16)
    r = _rng()

    def w(*s):
        return r.standard_normal(s).astype(np.float32) * 0.1

    sd = {}
    for i in range(2):
        p = f"m.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = np.abs(w(16)) + 0.5
        sd[f"{p}.post_attention_layernorm.weight"] = np.abs(w(16)) + 0.5
        sd[f"{p}.self_attn.q_proj.weight"] = w(16, 16)
        sd[f"{p}.self_attn.k_proj.weight"] = w(8, 16)
        sd[f"{p}.self_attn.v_proj.weight"] = w(8, 16)
        sd[f"{p}.self_attn.o_proj.weight"] = w(16, 16)
        sd[f"{p}.self_attn.q_norm.weight"] = np.abs(w(8)) + 0.5
        sd[f"{p}.self_attn.k_norm.weight"] = np.abs(w(8)) + 0.5
        sd[f"{p}.mlp.gate_proj.weight"] = w(32, 16)
        sd[f"{p}.mlp.up_proj.weight"] = w(32, 16)
        sd[f"{p}.mlp.down_proj.weight"] = w(16, 32)

    params = qwen3_stack_from_state_dict(sd, "m", cfg)
    from tts_tpu.nn.rope import rope_table

    cos, sin = rope_table(16, 8)
    kv = KVCache.create(2, 1, 1, 16, 8, jnp.float32)
    h = jax.random.normal(jax.random.key(0), (1, 3, 16))
    out, kv = qwen3_stack_step(params, h, kv, cfg, jnp.asarray(cos[:3]),
                               jnp.asarray(sin[:3]))
    assert out.shape == (1, 16)
    assert np.isfinite(np.asarray(out)).all()
    # scale fold: q_norm carries d^-0.25
    np.testing.assert_allclose(
        np.asarray(params["layers"][0]["q_norm"]),
        sd["m.layers.0.self_attn.q_norm.weight"] * 8 ** -0.25, atol=1e-6)


def test_bn_fold_matches_torch():
    import torch

    from tts_tpu.weights.indextts_loader import _bn_fold

    r = _rng()
    c = 6
    bn = torch.nn.BatchNorm1d(c).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(r.standard_normal(c).astype(np.float32)))
        bn.bias.copy_(torch.from_numpy(r.standard_normal(c).astype(np.float32)))
        bn.running_mean.copy_(torch.from_numpy(r.standard_normal(c).astype(np.float32)))
        bn.running_var.copy_(torch.from_numpy(np.abs(r.standard_normal(c)).astype(np.float32) + 0.1))

    sd = {"x.weight": bn.weight.detach().numpy(),
          "x.bias": bn.bias.detach().numpy(),
          "x.running_mean": bn.running_mean.numpy(),
          "x.running_var": bn.running_var.numpy()}
    p = _bn_fold(sd, "x")
    x = r.standard_normal((1, 5, c)).astype(np.float32)
    ours = x * np.asarray(p["scale"]) + np.asarray(p["shift"])
    with torch.no_grad():
        ref = bn(torch.from_numpy(x).transpose(1, 2)).transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_f5_ema_strip():
    from tts_tpu.weights.f5_loader import _strip_ema

    sd = {"ema_model.transformer.x": np.zeros(2),
          "ema_model.initted": np.zeros(1),
          "ema_model.step": np.zeros(1)}
    out = _strip_ema(sd)
    assert list(out) == ["transformer.x"]
    plain = {"transformer.x": np.zeros(2)}
    assert list(_strip_ema(plain)) == ["transformer.x"]


def test_voxcpm_llama_stack_loader_runs():
    from tts_tpu.kv.cache import KVCache
    from tts_tpu.models.voxcpm import LlamaStackConfig, llama_stack_step
    from tts_tpu.weights.voxcpm_loader import llama_stack_from_state_dict

    cfg = LlamaStackConfig(hidden_size=16, num_heads=2, num_kv_heads=1,
                           head_dim=8, ffn_dim=32, num_layers=1,
                           max_seq_len=16)
    r = _rng()

    def w(*s):
        return r.standard_normal(s).astype(np.float32) * 0.1

    p = "lm.layers.0"
    sd = {
        f"{p}.input_layernorm.weight": np.abs(w(16)) + 0.5,
        f"{p}.post_attention_layernorm.weight": np.abs(w(16)) + 0.5,
        f"{p}.self_attn.q_proj.weight": w(16, 16),
        f"{p}.self_attn.k_proj.weight": w(8, 16),
        f"{p}.self_attn.v_proj.weight": w(8, 16),
        f"{p}.self_attn.o_proj.weight": w(16, 16),
        f"{p}.mlp.gate_proj.weight": w(32, 16),
        f"{p}.mlp.up_proj.weight": w(32, 16),
        f"{p}.mlp.down_proj.weight": w(16, 32),
    }
    params = llama_stack_from_state_dict(sd, "lm", cfg)
    from tts_tpu.nn.rope import rope_table

    cos, sin = rope_table(16, 8)
    kv = KVCache.create(1, 1, 1, 16, 8, jnp.float32)
    h = jax.random.normal(jax.random.key(0), (1, 3, 16))
    out, kv = llama_stack_step(params, h, kv, cfg, jnp.asarray(cos[:3]),
                               jnp.asarray(sin[:3]))
    assert out.shape == (1, 3, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_save_load_roundtrip_with_quant():
    """Fused-pytree persistence (the reference's optimized-artifact analog)
    must round-trip arrays, lists, and quantized tensors."""
    import os
    import tempfile

    from tts_tpu.models.kani import KaniConfig, init_params
    from tts_tpu.quant import quantize_pytree
    from tts_tpu.weights.save import load_params, save_params

    cfg = KaniConfig(hidden_size=32, num_heads=2, num_kv_heads=1, head_dim=16,
                     ffn_dim=64, vocab_size=64, layer_types=("conv", "attn"),
                     max_seq_len=32, stop_token=63)
    params = quantize_pytree(init_params(cfg, jax.random.key(0)), min_size=256)
    path = tempfile.mktemp(suffix=".npz")
    try:
        save_params(path, params)
        back = load_params(path)
        fa, fb = jax.tree.leaves(params), jax.tree.leaves(back)
        assert len(fa) == len(fb)
        for a, b in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert isinstance(back["layers"], list) and len(back["layers"]) == 2
    finally:
        os.unlink(path)
