"""Qwen codec-decoder checkpoint loader: synthetic torch-layout state dict
-> pytree with the export-time folds, driven through codec_decode.

Key layout mirrors modeling_qwen3_tts_tokenizer_v2.py (unfused checkpoint);
the loader performs the folds the reference does at export
(Export_Qwen_TTS_ONNX.py:766-846)."""
import jax
import numpy as np
import pytest

from tests.test_qwen import TINY_CODEC
from tts_tpu.models.qwen_codec import codec_decode
from tts_tpu.weights.qwen_loader import qwen_codec_from_state_dict

P = "speech_tokenizer.model.decoder"


def _build_state_dict(cfg, rng):
    sd = {}

    def add(key, *shape, s=0.1):
        sd[key] = (rng.standard_normal(shape) * s).astype(np.float32)

    def conv(pre, cin, cout, k, transposed=False, bias=True):
        if transposed:
            add(f"{pre}.conv.weight", cin, cout, k)
        else:
            add(f"{pre}.conv.weight", cout, cin, k)
        if bias:
            add(f"{pre}.conv.bias", cout)

    def snake(pre, c):
        add(f"{pre}.alpha", c)
        add(f"{pre}.beta", c)

    # split RVQ
    for g, base in [(None, f"{P}.quantizer.rvq_first.vq.layers.0")] + [
            (g, f"{P}.quantizer.rvq_rest.vq.layers.{g}")
            for g in range(cfg.num_quantizers - 1)]:
        add(f"{base}._codebook.embedding_sum", cfg.codebook_size, cfg.rvq_dim)
        sd[f"{base}._codebook.cluster_usage"] = np.abs(
            rng.standard_normal(cfg.codebook_size).astype(np.float32)) + 0.5
    add(f"{P}.quantizer.rvq_first.output_proj.weight",
        cfg.codebook_dim, cfg.rvq_dim, 1)
    add(f"{P}.quantizer.rvq_rest.output_proj.weight",
        cfg.codebook_dim, cfg.rvq_dim, 1)

    conv(f"{P}.pre_conv", cfg.codebook_dim, cfg.latent_dim, 3)

    # pre-transformer
    tp = f"{P}.pre_transformer"
    add(f"{tp}.input_proj.weight", cfg.hidden_size, cfg.latent_dim)
    add(f"{tp}.input_proj.bias", cfg.hidden_size)
    for i in range(cfg.num_layers):
        lp = f"{tp}.layers.{i}"
        qd = cfg.num_heads * cfg.head_dim
        kd = cfg.num_kv_heads * cfg.head_dim
        add(f"{lp}.self_attn.q_proj.weight", qd, cfg.hidden_size)
        add(f"{lp}.self_attn.k_proj.weight", kd, cfg.hidden_size)
        add(f"{lp}.self_attn.v_proj.weight", kd, cfg.hidden_size)
        add(f"{lp}.self_attn.o_proj.weight", cfg.hidden_size, qd)
        add(f"{lp}.mlp.gate_proj.weight", cfg.ffn_dim, cfg.hidden_size)
        add(f"{lp}.mlp.up_proj.weight", cfg.ffn_dim, cfg.hidden_size)
        add(f"{lp}.mlp.down_proj.weight", cfg.hidden_size, cfg.ffn_dim)
        sd[f"{lp}.input_layernorm.weight"] = np.ones(cfg.hidden_size,
                                                     np.float32)
        sd[f"{lp}.post_attention_layernorm.weight"] = np.ones(
            cfg.hidden_size, np.float32)
        add(f"{lp}.self_attn_layer_scale.scale", cfg.hidden_size, s=0.02)
        add(f"{lp}.mlp_layer_scale.scale", cfg.hidden_size, s=0.02)
    sd[f"{tp}.norm.weight"] = np.ones(cfg.hidden_size, np.float32)
    add(f"{tp}.output_proj.weight", cfg.latent_dim, cfg.hidden_size)
    add(f"{tp}.output_proj.bias", cfg.latent_dim)

    # upsample ConvNeXt pairs (unfused: norm affine + gamma present)
    for i, r in enumerate(cfg.upsampling_ratios):
        conv(f"{P}.upsample.{i}.0", cfg.latent_dim, cfg.latent_dim, r,
             transposed=True)
        c = f"{P}.upsample.{i}.1"
        add(f"{c}.dwconv.conv.weight", cfg.latent_dim, 1, 7)
        add(f"{c}.dwconv.conv.bias", cfg.latent_dim)
        add(f"{c}.norm.weight", cfg.latent_dim)
        add(f"{c}.norm.bias", cfg.latent_dim)
        add(f"{c}.pwconv1.weight", 4 * cfg.latent_dim, cfg.latent_dim)
        add(f"{c}.pwconv1.bias", 4 * cfg.latent_dim)
        add(f"{c}.pwconv2.weight", cfg.latent_dim, 4 * cfg.latent_dim)
        add(f"{c}.pwconv2.bias", cfg.latent_dim)
        add(f"{c}.gamma", cfg.latent_dim)

    # vocoder stack
    conv(f"{P}.decoder.0", cfg.latent_dim, cfg.decoder_dim, 7)
    for i, r in enumerate(cfg.upsample_rates):
        cin = cfg.decoder_dim // 2 ** i
        cout = cfg.decoder_dim // 2 ** (i + 1)
        b = f"{P}.decoder.{i + 1}.block"
        snake(f"{b}.0", cin)
        conv(f"{b}.1", cin, cout, 2 * r, transposed=True)
        for j in range(3):
            snake(f"{b}.{2 + j}.act1", cout)
            conv(f"{b}.{2 + j}.conv1", cout, cout, 7)
            snake(f"{b}.{2 + j}.act2", cout)
            conv(f"{b}.{2 + j}.conv2", cout, cout, 1)
    out_dim = cfg.decoder_dim // 2 ** len(cfg.upsample_rates)
    n = len(cfg.upsample_rates)
    snake(f"{P}.decoder.{n + 1}", out_dim)
    conv(f"{P}.decoder.{n + 2}", out_dim, 1, 7)
    return sd


def test_codec_loader_decodes():
    rng = np.random.default_rng(0)
    sd = _build_state_dict(TINY_CODEC, rng)
    params = qwen_codec_from_state_dict(sd, TINY_CODEC)
    codes = rng.integers(0, TINY_CODEC.codebook_size,
                         (1, 6, TINY_CODEC.num_quantizers)).astype(np.int32)
    wav = np.asarray(jax.jit(
        lambda p, c: codec_decode(p, c, TINY_CODEC))(params, codes))
    total_up = int(np.prod(TINY_CODEC.upsample_rates)
                   * np.prod(TINY_CODEC.upsampling_ratios))
    assert wav.shape == (1, 6 * total_up)
    assert np.isfinite(wav).all()
    assert np.abs(wav).max() <= 1.0


def test_codec_loader_rvq_matches_manual():
    """RVQ dequantize through the loaded pytree == manual split-RVQ math on
    the raw state dict (tokenizer_v2.py:891-901)."""
    from tts_tpu.models.qwen_codec import rvq_dequantize

    cfg = TINY_CODEC
    rng = np.random.default_rng(1)
    sd = _build_state_dict(cfg, rng)
    params = qwen_codec_from_state_dict(sd, cfg)
    codes = rng.integers(0, cfg.codebook_size,
                         (1, 4, cfg.num_quantizers)).astype(np.int32)

    def emb(base):
        s = sd[f"{base}._codebook.embedding_sum"].astype(np.float64)
        u = sd[f"{base}._codebook.cluster_usage"].astype(np.float64)
        return s / np.clip(u, 1e-5, None)[:, None]

    sem = emb(f"{P}.quantizer.rvq_first.vq.layers.0")[codes[..., 0]]
    sem = sem @ sd[f"{P}.quantizer.rvq_first.output_proj.weight"][:, :, 0].T
    ac = sum(emb(f"{P}.quantizer.rvq_rest.vq.layers.{g}")[codes[..., g + 1]]
             for g in range(cfg.num_quantizers - 1))
    ac = ac @ sd[f"{P}.quantizer.rvq_rest.output_proj.weight"][:, :, 0].T
    gold = sem + ac

    import jax.numpy as jnp

    got = np.asarray(rvq_dequantize(params, jnp.asarray(codes)))
    np.testing.assert_allclose(got, gold, rtol=1e-4, atol=1e-5)
