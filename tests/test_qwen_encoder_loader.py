"""Mimi prompt-encoder checkpoint loader: synthetic HF-layout state dict ->
pytree, driven through mimi_encode + rvq_encode, plus a LayerNorm-fold
equivalence check (the loader folds LN affines/layer scales that the
reference export keeps separate — Export_Qwen_TTS_ONNX.py:555-581)."""
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.qwen_encoder import (
    MimiEncoderConfig,
    mimi_encode,
    rvq_encode,
)
from tts_tpu.weights.qwen_loader import mimi_encoder_from_state_dict

P = "speech_tokenizer.model.encoder"

TINY = MimiEncoderConfig(
    num_filters=4, upsampling_ratios=(4, 2), num_residual_layers=1,
    kernel_size=7, last_kernel_size=3, residual_kernel_size=3, compress=2,
    hidden_size=16, num_heads=2, head_dim=8, ffn_dim=32, num_layers=2,
    max_seq_len=128, downsample_stride=2, rvq_dim=8, codebook_size=16,
    num_quantizers=4,
)


def _build_state_dict(cfg, rng):
    sd = {}

    def add(key, *shape, s=0.1):
        sd[key] = (rng.standard_normal(shape) * s).astype(np.float32)

    def conv(pre, cin, cout, k):
        add(f"{pre}.conv.weight", cout, cin, k)
        add(f"{pre}.conv.bias", cout)

    e = f"{P}.encoder"
    idx = 0
    conv(f"{e}.layers.{idx}", 1, cfg.num_filters, cfg.kernel_size)
    idx += 1
    ch = cfg.num_filters
    for ratio in reversed(cfg.upsampling_ratios):
        hidden = ch // cfg.compress
        for _ in range(cfg.num_residual_layers):
            conv(f"{e}.layers.{idx}.block.1", ch, hidden,
                 cfg.residual_kernel_size)
            conv(f"{e}.layers.{idx}.block.3", hidden, ch, 1)
            idx += 1
        idx += 1  # ELU
        conv(f"{e}.layers.{idx}", ch, 2 * ch, 2 * ratio)
        idx += 1
        ch *= 2
    idx += 1  # ELU
    conv(f"{e}.layers.{idx}", ch, cfg.hidden_size, cfg.last_kernel_size)

    t = f"{P}.encoder_transformer"
    inner = cfg.num_heads * cfg.head_dim
    for i in range(cfg.num_layers):
        p = f"{t}.layers.{i}"
        add(f"{p}.self_attn.q_proj.weight", inner, cfg.hidden_size)
        add(f"{p}.self_attn.k_proj.weight", inner, cfg.hidden_size)
        add(f"{p}.self_attn.v_proj.weight", inner, cfg.hidden_size)
        add(f"{p}.self_attn.o_proj.weight", cfg.hidden_size, inner)
        add(f"{p}.mlp.fc1.weight", cfg.ffn_dim, cfg.hidden_size)
        add(f"{p}.mlp.fc2.weight", cfg.hidden_size, cfg.ffn_dim)
        add(f"{p}.input_layernorm.weight", cfg.hidden_size, s=1.0)
        add(f"{p}.input_layernorm.bias", cfg.hidden_size)
        add(f"{p}.post_attention_layernorm.weight", cfg.hidden_size, s=1.0)
        add(f"{p}.post_attention_layernorm.bias", cfg.hidden_size)
        add(f"{p}.self_attn_layer_scale.scale", cfg.hidden_size, s=0.05)
        add(f"{p}.mlp_layer_scale.scale", cfg.hidden_size, s=0.05)

    conv(f"{P}.downsample", cfg.hidden_size, cfg.hidden_size,
         2 * cfg.downsample_stride)

    q = f"{P}.quantizer"
    for base, n in ((f"{q}.semantic_residual_vector_quantizer", 1),
                    (f"{q}.acoustic_residual_vector_quantizer",
                     cfg.num_quantizers - 1)):
        add(f"{base}.input_proj.weight", cfg.rvq_dim, cfg.hidden_size, 1)
        for g in range(n):
            add(f"{base}.layers.{g}.codebook.embed_sum",
                cfg.codebook_size, cfg.rvq_dim, s=1.0)
            sd[f"{base}.layers.{g}.codebook.cluster_usage"] = np.abs(
                rng.standard_normal(cfg.codebook_size).astype(np.float32)
            ) + 0.5
    return sd


def test_encoder_loader_encodes():
    rng = np.random.default_rng(0)
    sd = _build_state_dict(TINY, rng)
    params = mimi_encoder_from_state_dict(sd, TINY)
    stride = int(np.prod(TINY.upsampling_ratios)) * TINY.downsample_stride
    audio = jnp.asarray(rng.standard_normal((1, 8 * stride)) * 0.1,
                        jnp.float32)
    emb = jax.jit(lambda p, a: mimi_encode(p, a, TINY))(params, audio)
    assert emb.shape[-1] == TINY.hidden_size
    assert np.isfinite(np.asarray(emb)).all()
    codes = np.asarray(jax.jit(
        lambda p, e: rvq_encode(p, e, TINY))(params, emb))
    assert codes.shape == (1, emb.shape[1], TINY.num_quantizers)
    assert (codes >= 0).all() and (codes < TINY.codebook_size).all()


def test_encoder_ln_fold_matches_unfolded():
    """Folded qkv == q_proj(LN(x)) for the raw affine LayerNorm."""
    rng = np.random.default_rng(1)
    sd = _build_state_dict(TINY, rng)
    params = mimi_encoder_from_state_dict(sd, TINY)

    x = rng.standard_normal((3, TINY.hidden_size)).astype(np.float64)
    xn = (x - x.mean(-1, keepdims=True)) / np.sqrt(
        x.var(-1, keepdims=True) + 1e-5)
    p = f"{P}.encoder_transformer.layers.0"
    ln = xn * sd[f"{p}.input_layernorm.weight"] + sd[f"{p}.input_layernorm.bias"]
    scale = TINY.head_dim ** -0.25
    gold_q = ln @ sd[f"{p}.self_attn.q_proj.weight"].T.astype(np.float64) * scale

    lay = params["layers"][0]
    got = np.asarray(xn, np.float32) @ np.asarray(lay["wqkv"], np.float32) \
        + np.asarray(lay["bqkv"], np.float32)
    inner = TINY.num_heads * TINY.head_dim
    np.testing.assert_allclose(got[:, :inner], gold_q, rtol=1e-4, atol=1e-5)
