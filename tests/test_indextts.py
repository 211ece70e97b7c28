"""IndexTTS: rel-shift golden math, encoder shapes, GPT incremental
consistency, penalty-vector semantics, and pipeline smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.kv.cache import KVCache
from tts_tpu.models.indextts import (
    IndexTTSConfig,
    _rel_shift,
    conformer_encoder,
    ecapa_speaker_encoder,
    gpt_step,
    init_conformer_params,
    init_ecapa_params,
    init_gpt_params,
    init_perceiver_params,
    perceiver_resample,
)

TINY = IndexTTSConfig(
    enc_dim=32, enc_heads=2, enc_ff_dim=64, enc_layers=2, enc_conv_kernel=7,
    num_latents=4, perceiver_heads=2, perceiver_dim_head=8,
    n_mels=24, ecapa_channels=16, ecapa_attn_channels=8, res2net_scale=4,
    se_channels=8, speaker_embed_dim=12,
    gpt_dim=32, gpt_heads=2, gpt_layers=2, num_mel_codes=64,
    num_text_tokens=50, max_text_tokens=32, max_mel_tokens=32,
    max_seq_len=128, stop_token=63, start_mel_token=62,
)


def test_rel_shift_matches_torch_reference():
    """Golden vs the reference rel_shift (Export_IndexTTS.py:67-71)."""
    import torch

    h, t = 2, 5
    rng = np.random.default_rng(0)
    x = rng.standard_normal((h, t, t)).astype(np.float32)

    xt = torch.from_numpy(x)
    zero_pad = torch.zeros((h, t, 1))
    x_padded = torch.cat([zero_pad, xt], dim=-1)
    x_padded = x_padded.view(h, -1, t)
    ref = x_padded[:, 1:].view_as(xt)[:, :, :t].numpy()

    out = np.asarray(_rel_shift(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_conformer_shapes():
    params = init_conformer_params(TINY, jax.random.key(0))
    mel = jax.random.normal(jax.random.key(1), (1, 41, TINY.n_mels))
    out = jax.jit(lambda m: conformer_encoder(params, m, TINY))(mel)
    t_sub = ((41 - 1) // 2 - 1) // 2
    assert out.shape == (1, t_sub, TINY.enc_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_perceiver_shapes():
    params = init_perceiver_params(TINY, jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (1, 9, TINY.enc_dim))
    out = jax.jit(lambda x: perceiver_resample(params, x, TINY))(x)
    assert out.shape == (1, TINY.num_latents, TINY.enc_dim)


def test_ecapa_shapes():
    params = init_ecapa_params(TINY, jax.random.key(0))
    mel = jax.random.normal(jax.random.key(1), (1, 20, TINY.n_mels))
    out = jax.jit(lambda m: ecapa_speaker_encoder(params, m, TINY))(mel)
    assert out.shape == (1, 1, TINY.speaker_embed_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_gpt_incremental_matches_batch():
    params = init_gpt_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(2)
    hidden = jnp.asarray(rng.standard_normal((1, 5, TINY.gpt_dim)), jnp.float32)
    ones = jnp.ones((1, TINY.num_mel_codes))

    step = jax.jit(lambda h, kv: gpt_step(params, h, kv, ones, TINY))

    kv = KVCache.create(TINY.gpt_layers, 1, TINY.gpt_heads, TINY.max_seq_len,
                        TINY.gpt_head_dim, jnp.float32)
    logits_b, last_b, _ = step(hidden, kv)

    kv = KVCache.create(TINY.gpt_layers, 1, TINY.gpt_heads, TINY.max_seq_len,
                        TINY.gpt_head_dim, jnp.float32)
    for t in range(5):
        logits_i, last_i, kv = step(hidden[:, t:t + 1], kv)

    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_i),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(last_b), np.asarray(last_i),
                               atol=2e-4)


def test_gpt_kv_hole_masking():
    """Masked-out kv positions must not influence logits — the text-bucket
    padding contract of runtime/indextts.py."""
    params = init_gpt_params(TINY, jax.random.key(1))
    rng = np.random.default_rng(3)
    base = rng.standard_normal((1, 6, TINY.gpt_dim)).astype(np.float32)
    pert = base.copy()
    pert[:, 3:5] = 99.0                                   # the "hole"
    kv_valid = jnp.asarray([True, True, True, False, False, True]
                           + [True] * (TINY.max_seq_len - 6))
    ones = jnp.ones((1, TINY.num_mel_codes))

    def run(h):
        kv = KVCache.create(TINY.gpt_layers, 1, TINY.gpt_heads,
                            TINY.max_seq_len, TINY.gpt_head_dim, jnp.float32)
        logits, _, _ = gpt_step(params, jnp.asarray(h), kv, ones, TINY,
                                kv_valid)
        return np.asarray(logits)

    np.testing.assert_allclose(run(base), run(pert), atol=1e-5)


def test_indextts_pipeline_smoke():
    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bigvgan_init
    from tts_tpu.runtime.indextts import IndexTTSPipeline

    vcfg = BigVGANConfig(
        num_mels=TINY.gpt_dim, upsample_initial_channel=16,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        use_tanh_at_final=True, use_bias_at_final=True,
    )
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    c0 = vcfg.upsample_initial_channel
    params = {
        "conformer": init_conformer_params(TINY, ks[0]),
        "perceiver": init_perceiver_params(TINY, ks[1]),
        "ecapa": init_ecapa_params(TINY, ks[2]),
        "gpt": init_gpt_params(TINY, ks[3]),
        "bigvgan": bigvgan_init(vcfg, ks[4]),
        "cond_layer": {
            "w": jax.random.normal(ks[5], (TINY.speaker_embed_dim, c0)) * 0.02,
            "b": jnp.zeros((c0,)),
        },
        "conds": [
            {"w": jax.random.normal(ks[6], (TINY.speaker_embed_dim, c)) * 0.02,
             "b": jnp.zeros((c,))}
            for c in vcfg.stage_channels
        ],
    }
    # perceiver latents live in enc_dim; gpt_dim must match for concat —
    # tiny config uses enc_dim == gpt_dim == 32
    pipe = IndexTTSPipeline(params, TINY, vcfg, sample_rate=8000,
                            n_fft=256, hop=64)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(4000) * 3000).astype(np.int16)
    ref = pipe.encode_reference(audio)
    ids = np.array([[5, 9, 13]], np.int32)
    wav, stats = pipe.synthesize_ids(ids, ref, max_gen=12)
    assert wav.dtype == np.int16
    assert stats.tokens <= 12

    # int8 weight-only GPT follows the same decode path
    pipe8 = IndexTTSPipeline(params, TINY, vcfg, sample_rate=8000,
                             n_fft=256, hop=64, quantize=8)
    wav8, stats8 = pipe8.synthesize_ids(ids, ref, max_gen=12)
    assert wav8.dtype == np.int16
    assert stats8.tokens <= 12


def test_batched_decode_matches_single():
    """Each stream in a batch must reproduce its single-stream decode: the
    learned absolute positions line up because every row shares the text
    bucket and padding holes are masked per row."""
    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bigvgan_init
    from tts_tpu.runtime.indextts import IndexTTSPipeline

    vcfg = BigVGANConfig(
        num_mels=TINY.gpt_dim, upsample_initial_channel=16,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        use_tanh_at_final=True, use_bias_at_final=True,
    )
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    c0 = vcfg.upsample_initial_channel
    params = {
        "conformer": init_conformer_params(TINY, ks[0]),
        "perceiver": init_perceiver_params(TINY, ks[1]),
        "ecapa": init_ecapa_params(TINY, ks[2]),
        "gpt": init_gpt_params(TINY, ks[3]),
        "bigvgan": bigvgan_init(vcfg, ks[4]),
        "cond_layer": {
            "w": jax.random.normal(ks[5], (TINY.speaker_embed_dim, c0)) * 0.02,
            "b": jnp.zeros((c0,)),
        },
        "conds": [
            {"w": jax.random.normal(ks[6], (TINY.speaker_embed_dim, c)) * 0.02,
             "b": jnp.zeros((c,))}
            for c in vcfg.stage_channels
        ],
    }
    pipe = IndexTTSPipeline(params, TINY, vcfg, sample_rate=8000,
                            n_fft=256, hop=64)
    rng = np.random.default_rng(0)
    ref1 = pipe.encode_reference((rng.standard_normal(4000) * 3000).astype(np.int16))
    ref2 = pipe.encode_reference((rng.standard_normal(5000) * 3000).astype(np.int16))
    ids1 = np.array([[5, 9, 13]], np.int32)
    ids2 = np.array([[2, 7, 4, 11, 3]], np.int32)

    wav1, s1 = pipe.synthesize_ids(ids1, ref1, max_gen=12)
    wav2, s2 = pipe.synthesize_ids(ids2, ref2, max_gen=12)
    wavs, sb = pipe.synthesize_ids_batch([(ids1, ref1), (ids2, ref2)],
                                         max_gen=12)
    np.testing.assert_array_equal(wav1, wavs[0])
    np.testing.assert_array_equal(wav2, wavs[1])
    assert sb["tokens"] == s1.tokens + s2.tokens


def test_pipeline_feat_upsample_vocode():
    """feat_upsample wiring through _vocode_fn and the batch variant:
    output is 4x longer per frame (reference models.py:213-218) and the
    runtime's length bookkeeping uses total_upsample."""
    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bigvgan_init
    from tts_tpu.runtime.indextts import IndexTTSPipeline

    vcfg = BigVGANConfig(
        num_mels=TINY.gpt_dim, upsample_initial_channel=16,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        use_tanh_at_final=True, use_bias_at_final=True,
        resblock="2", feat_upsample=True,
    )
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    c0 = vcfg.upsample_initial_channel
    params = {
        "conformer": init_conformer_params(TINY, ks[0]),
        "perceiver": init_perceiver_params(TINY, ks[1]),
        "ecapa": init_ecapa_params(TINY, ks[2]),
        "gpt": init_gpt_params(TINY, ks[3]),
        "bigvgan": bigvgan_init(vcfg, ks[4]),
        "cond_layer": {
            "w": jax.random.normal(ks[5], (TINY.speaker_embed_dim, c0)) * 0.02,
            "b": jnp.zeros((c0,)),
        },
        "conds": [
            {"w": jax.random.normal(ks[6], (TINY.speaker_embed_dim, c)) * 0.02,
             "b": jnp.zeros((c,))}
            for c in vcfg.stage_channels
        ],
    }
    pipe = IndexTTSPipeline(params, TINY, vcfg, sample_rate=8000,
                            n_fft=256, hop=64)
    rng = np.random.default_rng(2)
    audio = (rng.standard_normal(4000) * 3000).astype(np.int16)
    ref = pipe.encode_reference(audio)
    ids = np.array([[5, 9, 13]], np.int32)
    wav, stats = pipe.synthesize_ids(ids, ref, max_gen=12)
    n_frames = max(stats.tokens - 2, 0)
    assert vcfg.total_upsample == 4 * 8
    assert wav.shape == (n_frames * 32,)

    wavs, _ = pipe.synthesize_ids_batch([(ids, ref), (ids, ref)], max_gen=12)
    assert all(w.shape == (n_frames * 32,) for w in wavs)
    np.testing.assert_array_equal(wavs[0], wavs[1])
