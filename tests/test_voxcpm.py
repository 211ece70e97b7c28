"""VoxCPM-1.5: VAE shape/causality, FSQ bottleneck grid, CFM schedule golden
math, dual-LM incremental consistency, and pipeline smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.kv.cache import KVCache
from tts_tpu.models.voxcpm import (
    LlamaStackConfig,
    VaeConfig,
    VoxCPMConfig,
    cfm_time_schedule,
    fsq_layer,
    init_params,
    init_vae_params,
    vae_decode,
    vae_encode,
    voxcpm_main_step,
)

TINY = VoxCPMConfig(
    base=LlamaStackConfig(hidden_size=32, num_heads=2, num_kv_heads=1,
                          head_dim=16, ffn_dim=64, num_layers=2,
                          max_seq_len=512),
    residual=LlamaStackConfig(hidden_size=32, num_heads=2, num_kv_heads=1,
                              head_dim=16, ffn_dim=64, num_layers=1,
                              max_seq_len=512),
    feat_encoder=LlamaStackConfig(hidden_size=24, num_heads=2, num_kv_heads=1,
                                  head_dim=12, ffn_dim=48, num_layers=1,
                                  max_seq_len=8),
    estimator=LlamaStackConfig(hidden_size=24, num_heads=2, num_kv_heads=1,
                               head_dim=12, ffn_dim=48, num_layers=1,
                               max_seq_len=16),
    vae=VaeConfig(d_model=4, latent_dim=8, strides=(2, 4),
                  decoder_channels=16),
    patch_size=4, chunk_size=8, fsq_dim=8, vocab_size=128,
    audio_start_id=101, cfm_steps=4,
)


def test_cfm_time_schedule_matches_torch():
    """Reference :546-548: sway-sampled descending t-span."""
    import torch

    steps, sway = 10, 1.0
    t = torch.linspace(1, 0, steps + 1, dtype=torch.float32)
    ref = (t + sway * (torch.cos(torch.pi / 2 * t) - 1 + t))[1:]
    ts, dt = cfm_time_schedule(steps, sway)
    np.testing.assert_allclose(ts, ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(dt, (ref[:-1] - ref[1:]).numpy(), atol=1e-6)


def test_vae_roundtrip_shapes():
    vae_params = init_vae_params(TINY.vae, jax.random.key(0))
    total = int(np.prod(TINY.vae.strides))
    audio = jax.random.normal(jax.random.key(1), (1, 32 * total))
    lat = jax.jit(lambda a: vae_encode(vae_params, a, TINY.vae))(audio)
    assert lat.shape == (1, 32, TINY.vae.latent_dim)
    wav = jax.jit(lambda z: vae_decode(vae_params["dec"], z, TINY.vae))(lat)
    assert wav.shape == (1, 32 * total)
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_vae_encoder_causality():
    """Future samples must not change earlier latents."""
    vae_params = init_vae_params(TINY.vae, jax.random.key(2))
    total = int(np.prod(TINY.vae.strides))
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 16 * total)).astype(np.float32)
    b = a.copy()
    b[:, -total:] += 5.0
    fn = jax.jit(lambda x: vae_encode(vae_params, jnp.asarray(x), TINY.vae))
    la, lb = np.asarray(fn(a)), np.asarray(fn(b))
    np.testing.assert_allclose(la[:, :8], lb[:, :8], atol=1e-5)
    assert np.abs(la[:, -1] - lb[:, -1]).max() > 1e-6


def test_fsq_layer_quantizes_to_grid():
    params = init_params(TINY, jax.random.key(0))
    x = jax.random.normal(jax.random.key(3), (1, 4, TINY.base.hidden_size))
    # intercept the bottleneck: down-projected, tanh'd, rounded values must
    # land on the (levels-1)/2 grid
    z = jnp.matmul(x, params["fsq_down"]["w"]) + params["fsq_down"]["b"]
    half = (TINY.fsq_levels - 1) / 2.0
    q = jnp.round(jnp.tanh(z) * half) / half
    grid = np.round(np.asarray(q) * half) / half
    np.testing.assert_allclose(np.asarray(q), grid, atol=1e-7)
    out = fsq_layer(params, x, TINY)
    assert out.shape == x.shape
    # idempotence through the bottleneck grid: same input -> same output
    out2 = fsq_layer(params, x, TINY)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_main_step_incremental_consistency():
    """Serial prefill must equal batched prefill through both LMs."""
    params = init_params(TINY, jax.random.key(4))
    b = TINY.base
    hidden = jax.random.normal(jax.random.key(5), (1, 4, b.hidden_size))

    def fresh():
        return (KVCache.create(b.num_layers, 1, b.num_kv_heads, 64,
                               b.head_dim, jnp.float32),
                KVCache.create(TINY.residual.num_layers, 1,
                               TINY.residual.num_kv_heads, 64,
                               TINY.residual.head_dim, jnp.float32))

    step = jax.jit(lambda h, ctl, bk, rk: voxcpm_main_step(
        params, h, jnp.zeros_like(h), ctl, bk, rk, TINY))

    bk, rk = fresh()
    dit_b, stop_b, _, _ = step(hidden, jnp.int32(4), bk, rk)

    bk, rk = fresh()
    for t in range(4):
        dit_i, stop_i, bk, rk = step(hidden[:, t:t + 1], jnp.int32(1), bk, rk)

    np.testing.assert_allclose(np.asarray(dit_b), np.asarray(dit_i), atol=2e-4)
    assert int(stop_b) == int(stop_i)


def test_voxcpm_pipeline_smoke():
    from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

    params = init_params(TINY, jax.random.key(0))
    vae_params = init_vae_params(TINY.vae, jax.random.key(1))
    pipe = VoxCPMPipeline(params, TINY, vae_params,
                          VoxCPMDecodeConfig(max_latents=5))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(200) * 3000).astype(np.int16)
    p_ids = np.array([[3, 7]], np.int32)
    t_ids = np.array([[11, 13, 17]], np.int32)
    wav, stats = pipe.synthesize_ids(p_ids, t_ids, audio, seed=1)
    wav2, _ = pipe.synthesize_ids(p_ids, t_ids, audio, seed=1)
    assert wav.dtype == np.int16
    np.testing.assert_array_equal(wav, wav2)
    assert stats["latents"] <= 5

    pipe8 = VoxCPMPipeline(params, TINY, vae_params,
                           VoxCPMDecodeConfig(max_latents=5), quantize=8)
    wav8, stats8 = pipe8.synthesize_ids(p_ids, t_ids, audio, seed=1)
    assert wav8.dtype == np.int16
    assert stats8["latents"] <= 5


def test_batched_decode_matches_single():
    """B=1 batched serving must reproduce the single path exactly (same
    PRNG chain, right-justification only shifts rope by a constant); B=2
    produces per-request counts/finite audio."""
    from tts_tpu.models.voxcpm import init_params, init_vae_params
    from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

    params = init_params(TINY, jax.random.key(0))
    vae = init_vae_params(TINY.vae, jax.random.key(1))
    pipe = VoxCPMPipeline(params, TINY, vae,
                          VoxCPMDecodeConfig(max_latents=6, min_latents=2))
    p1 = np.array([[5, 9]], np.int32)
    t1 = np.array([[11, 3, 7]], np.int32)

    single, st = pipe.synthesize_ids(p1, t1, seed=5)
    batch1, sb = pipe.synthesize_ids_batch([(p1, t1)], seed=5)
    np.testing.assert_array_equal(single, batch1[0])

    p2 = np.array([[2]], np.int32)
    t2 = np.array([[8, 1, 4, 9]], np.int32)
    wavs, stats = pipe.synthesize_ids_batch([(p1, t1), (p2, t2)], seed=3)
    assert len(wavs) == 2
    for w in wavs:
        assert w.dtype == np.int16
        assert np.isfinite(w.astype(np.float32)).all()
    assert stats["latents"] >= 2


def test_batched_decode_with_prompt_audio_matches_single():
    """Voice-cloning rows in a batch (B=1) must reproduce the single path's
    [text | audio_start | prompt feats] layout exactly."""
    from tts_tpu.models.voxcpm import init_params, init_vae_params
    from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

    params = init_params(TINY, jax.random.key(0))
    vae = init_vae_params(TINY.vae, jax.random.key(1))
    pipe = VoxCPMPipeline(params, TINY, vae,
                          VoxCPMDecodeConfig(max_latents=5, min_latents=2))
    p1 = np.array([[5, 9]], np.int32)
    t1 = np.array([[11, 3, 7]], np.int32)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(TINY.patch_size * TINY.chunk_size * 3)
             * 3000).astype(np.int16)

    single, _ = pipe.synthesize_ids(p1, t1, prompt_audio=audio, seed=4)
    batch1, _ = pipe.synthesize_ids_batch([(p1, t1)],
                                          prompt_audios=[audio], seed=4)
    np.testing.assert_array_equal(single, batch1[0])
