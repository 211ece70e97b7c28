"""Mesh/sharding helpers: tensor-parallel inference must match single-device
output (XLA inserts the collectives)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.parallel import make_mesh, replicate, shard_params_tp


def test_virtual_mesh_available():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"


def test_make_mesh_shapes():
    mesh = make_mesh(dp=2, tp=4)
    assert mesh.shape == {"dp": 2, "tp": 4}
    with pytest.raises(ValueError):
        make_mesh(dp=16)


def test_tp_sharded_dit_matches_single_device():
    from tts_tpu.models.f5 import F5Config, dit_forward, init_params

    cfg = F5Config(dim=32, depth=2, heads=4, head_dim=8, ff_mult=2,
                   text_dim=16, conv_layers=1, n_mels=8, vocab_size=16,
                   nfe_steps=4, max_signal_len=64, freq_embed_dim=16)
    params = init_params(cfg, jax.random.key(0))
    t = 16
    noise = jax.random.normal(jax.random.key(1), (1, t, cfg.n_mels))
    cond = jax.random.normal(jax.random.key(2),
                             (1, t, cfg.n_mels + cfg.text_dim))

    def fwd(p):
        pred, pred1 = dit_forward(
            p, noise, cond, jnp.zeros_like(cond), p["time_table"][0],
            p["rope_cos"][:t], p["rope_sin"][:t], cfg)
        return pred

    ref = np.asarray(jax.jit(fwd)(params))

    mesh = make_mesh(dp=1, tp=4)
    sharded = shard_params_tp(params, mesh)
    with mesh:
        out = np.asarray(jax.jit(fwd)(sharded))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_replicate():
    mesh = make_mesh(dp=2, tp=4)
    params = {"w": jnp.ones((16, 16))}
    rep = replicate(params, mesh)
    assert rep["w"].sharding.is_fully_replicated


def test_tp_sharded_f5_pipeline_matches_single_device():
    """Pipeline-level tensor-parallel serving: F5Pipeline(mesh=...) must
    produce bit-identical audio to the single-device pipeline."""
    from tts_tpu.models.f5 import F5Config, init_params
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    cfg = F5Config(dim=32, depth=2, heads=4, head_dim=8, ff_mult=2,
                   text_dim=16, conv_layers=1, n_mels=20, vocab_size=16,
                   nfe_steps=4, max_signal_len=512, freq_embed_dim=16,
                   sample_rate=8000, n_fft=256, hop=64, win_length=256)
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=48,
                       num_layers=1, n_fft=256, hop=64, sample_rate=8000)
    params = init_params(cfg, jax.random.key(0))
    vparams = vocos_init(vcfg, jax.random.key(1))
    vocab = {" ": 0, "a": 1, "b": 2}

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(4000) * 3000).astype(np.int16)

    ref_pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg)
    ref_wav, _ = ref_pipe.synthesize(audio, "ab", "ba", seed=3)

    mesh = make_mesh(dp=1, tp=4)
    tp_pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg, mesh=mesh)
    tp_wav, _ = tp_pipe.synthesize(audio, "ab", "ba", seed=3)

    np.testing.assert_allclose(tp_wav.astype(np.int32),
                               ref_wav.astype(np.int32), atol=1)


def test_dp_sharded_kani_batch_matches_single_device():
    """Data-parallel batched serving: KaniPipeline(mesh=...) shards the
    request batch over the dp axis with replicated params; every stream
    must be bit-identical to the unsharded batched decode."""
    from tts_tpu.models.kani import KaniConfig, init_params
    from tts_tpu.models.nanocodec import NanoCodecConfig
    from tts_tpu.models.nanocodec import init_params as nc_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    cfg = KaniConfig(hidden_size=32, num_heads=2, num_kv_heads=1,
                     head_dim=16, ffn_dim=64, vocab_size=128,
                     layer_types=("conv", "attn"), max_seq_len=64,
                     stop_token=127)
    ccfg = NanoCodecConfig(base_channels=16, up_sample_rates=(2, 2),
                           kernel_sizes=(3,), dilations=(1, 3),
                           activation="half_snake")
    params = init_params(cfg, jax.random.key(0))
    cparams = nc_init(ccfg, jax.random.key(1))
    dcfg = KaniDecodeConfig(max_new_tokens=18)
    reqs = [np.array([[3 + b, 9, 27 - b, 5]], np.int32) for b in range(4)]

    ref = KaniPipeline(params, cfg, cparams, ccfg, dcfg,
                       audio_tokens_start=0)
    ref_wavs, ref_stats = ref.synthesize_ids_batch(reqs)

    mesh = make_mesh(dp=4, tp=1)
    dp_pipe = KaniPipeline(params, cfg, cparams, ccfg, dcfg,
                           audio_tokens_start=0, mesh=mesh)
    dp_wavs, dp_stats = dp_pipe.synthesize_ids_batch(reqs)

    assert dp_stats["tokens"] == ref_stats["tokens"]
    for a, b in zip(ref_wavs, dp_wavs):
        np.testing.assert_array_equal(a, b)

    import pytest
    with pytest.raises(ValueError, match="not divisible"):
        dp_pipe.synthesize_ids_batch(reqs[:3])


def test_dp_sharded_qwen_batch_matches_single_device():
    """DP batched serving for the two-level Qwen decode: batch sharded over
    dp, params replicated, per-stream output bit-identical."""
    import test_qwen as tq
    from tts_tpu.models.qwen_codec import init_decoder_params
    from tts_tpu.models.qwen_tts import (init_predictor_params,
                                         init_talker_params)
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(tq.TINY, jax.random.key(0)),
              **init_predictor_params(tq.TINY, jax.random.key(1))}
    cparams = init_decoder_params(tq.TINY_CODEC, jax.random.key(2))
    dcfg = QwenDecodeConfig(max_frames=5)
    ref = QwenTTSPipeline(params, tq.TINY, cparams, tq.TINY_CODEC, dcfg)
    reqs = []
    for ids, lang in ((np.array([[5, 9, 13, 2]], np.int32), 3),
                      (np.array([[7, 1, 4]], np.int32), 2)):
        reqs.append(ref.build_prefill_embeds(ids, lang))
    ref_wavs, ref_stats = ref.synthesize_from_prefill_batch(reqs)

    mesh = make_mesh(dp=2, tp=1)
    dp_pipe = QwenTTSPipeline(params, tq.TINY, cparams, tq.TINY_CODEC,
                              dcfg, mesh=mesh)
    dp_wavs, dp_stats = dp_pipe.synthesize_from_prefill_batch(reqs)
    assert dp_stats["frames"] == ref_stats["frames"]
    for a, b in zip(ref_wavs, dp_wavs):
        np.testing.assert_array_equal(a, b)


def test_dp_sharded_voxcpm_batch_matches_single_device():
    """DP batched serving for the VoxCPM dual-LM + CFM decode (the
    feat_cond (2B, ...) pos/neg layout splits cleanly when 2B % dp == 0)."""
    import test_voxcpm as tv
    from tts_tpu.models.voxcpm import init_params, init_vae_params
    from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

    params = init_params(tv.TINY, jax.random.key(0))
    vae = init_vae_params(tv.TINY.vae, jax.random.key(1))
    dcfg = VoxCPMDecodeConfig(max_latents=6, min_latents=2)
    ref = VoxCPMPipeline(params, tv.TINY, vae, dcfg)
    p1 = np.array([[5, 9]], np.int32)
    t1 = np.array([[11, 3, 7]], np.int32)
    p2 = np.array([[2]], np.int32)
    t2 = np.array([[8, 1, 4, 9]], np.int32)
    ref_wavs, _ = ref.synthesize_ids_batch([(p1, t1), (p2, t2)], seed=3)

    mesh = make_mesh(dp=2, tp=1)
    dp_pipe = VoxCPMPipeline(params, tv.TINY, vae, dcfg, mesh=mesh)
    dp_wavs, _ = dp_pipe.synthesize_ids_batch([(p1, t1), (p2, t2)], seed=3)
    for a, b in zip(ref_wavs, dp_wavs):
        np.testing.assert_array_equal(a, b)


def test_dp_sharded_indextts_batch_matches_single_device():
    """DP batched serving for IndexTTS (decode + batched speaker-conditioned
    vocoder fed from the sharded hiddens buffer)."""
    import test_indextts as ti
    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bigvgan_init
    from tts_tpu.models.indextts import (init_conformer_params,
                                         init_ecapa_params, init_gpt_params,
                                         init_perceiver_params)
    from tts_tpu.runtime.indextts import IndexTTSPipeline
    import jax.numpy as jnp

    TINY = ti.TINY
    vcfg = BigVGANConfig(
        num_mels=TINY.gpt_dim, upsample_initial_channel=16,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        use_tanh_at_final=True, use_bias_at_final=True,
    )
    ks = jax.random.split(jax.random.key(0), 8)
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
    ref = IndexTTSPipeline(params, TINY, vcfg, sample_rate=8000,
                           n_fft=256, hop=64)
    rng = np.random.default_rng(0)
    r1 = ref.encode_reference((rng.standard_normal(4000) * 3000)
                              .astype(np.int16))
    r2 = ref.encode_reference((rng.standard_normal(5000) * 3000)
                              .astype(np.int16))
    ids1 = np.array([[5, 9, 13]], np.int32)
    ids2 = np.array([[2, 7, 4, 11, 3]], np.int32)
    reqs = [(ids1, r1), (ids2, r2)]
    ref_wavs, ref_stats = ref.synthesize_ids_batch(reqs, max_gen=12)

    mesh = make_mesh(dp=2, tp=1)
    dp_pipe = IndexTTSPipeline(params, TINY, vcfg, sample_rate=8000,
                               n_fft=256, hop=64, mesh=mesh)
    dp_wavs, dp_stats = dp_pipe.synthesize_ids_batch(reqs, max_gen=12)
    assert dp_stats["tokens"] == ref_stats["tokens"]
    for a, b in zip(ref_wavs, dp_wavs):
        np.testing.assert_array_equal(a, b)


def test_dp_tp_sharded_f5_batch_matches_single_device():
    """dp x tp composed F5 serving: params tp-sharded (replicated across
    dp), request batch dp-sharded. Matches the unsharded batch within the
    TP reduction-order tolerance."""
    from tts_tpu.models.f5 import F5Config, init_params
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    cfg = F5Config(dim=64, depth=2, heads=4, head_dim=16, ff_mult=2,
                   text_dim=24, conv_layers=1, n_mels=20, vocab_size=16,
                   nfe_steps=4, max_signal_len=512, freq_embed_dim=16,
                   sample_rate=8000, n_fft=256, hop=64, win_length=256)
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=48,
                       num_layers=1, n_fft=256, hop=64, sample_rate=8000)
    params = init_params(cfg, jax.random.key(0))
    vparams = vocos_init(vcfg, jax.random.key(1))
    vocab = {" ": 0, "a": 1, "b": 2}
    rng = np.random.default_rng(0)
    reqs = [((rng.standard_normal(4000) * 3000).astype(np.int16), "ab", "ba"),
            ((rng.standard_normal(3500) * 3000).astype(np.int16), "b", "ab")]

    ref_pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg)
    ref_wavs, _ = ref_pipe.synthesize_batch(reqs, seed=3)

    mesh = make_mesh(dp=2, tp=4)
    dp_pipe = F5Pipeline(params, cfg, vocab, vparams, vcfg, mesh=mesh)
    dp_wavs, _ = dp_pipe.synthesize_batch(reqs, seed=3)
    for a, b in zip(ref_wavs, dp_wavs):
        np.testing.assert_allclose(b.astype(np.int32), a.astype(np.int32),
                                   atol=1)


def test_dp_sharded_qwen_beam_batch_matches_single_device():
    """DP sharding must compose with per-request beam batched serving (the
    (B*beam) predictor rows follow the dp-sharded batch axis)."""
    import test_qwen as tq
    from tts_tpu.models.qwen_codec import init_decoder_params
    from tts_tpu.models.qwen_tts import (init_predictor_params,
                                         init_talker_params)
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(tq.TINY, jax.random.key(0)),
              **init_predictor_params(tq.TINY, jax.random.key(1))}
    cparams = init_decoder_params(tq.TINY_CODEC, jax.random.key(2))
    dcfg = QwenDecodeConfig(max_frames=4, use_beam=True, beam_size=2,
                            beam_top_k=2)
    ref = QwenTTSPipeline(params, tq.TINY, cparams, tq.TINY_CODEC, dcfg)
    reqs = []
    for ids, lang in ((np.array([[5, 9, 13, 2]], np.int32), 3),
                      (np.array([[7, 1, 4]], np.int32), 2)):
        reqs.append(ref.build_prefill_embeds(ids, lang))
    ref_wavs, ref_stats = ref.synthesize_from_prefill_batch(reqs)

    mesh = make_mesh(dp=2, tp=1)
    dp_pipe = QwenTTSPipeline(params, tq.TINY, cparams, tq.TINY_CODEC,
                              dcfg, mesh=mesh)
    dp_wavs, dp_stats = dp_pipe.synthesize_from_prefill_batch(reqs)
    assert dp_stats["frames"] == ref_stats["frames"]
    for a, b in zip(ref_wavs, dp_wavs):
        np.testing.assert_array_equal(a, b)
