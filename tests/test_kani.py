"""KaniTTS hybrid LM + NanoCodec: incremental-vs-batch consistency, FSQ
dequant golden math, causality, and pipeline smoke tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.kani import (
    KaniConfig,
    embed_tokens,
    init_params,
    init_state,
    kani_step,
)
from tts_tpu.models.nanocodec import (
    NanoCodecConfig,
    fsq_dequantize,
    hifigan_decode,
    init_params as codec_init,
    tokens_to_codes,
)

TINY = KaniConfig(
    hidden_size=32, num_heads=2, num_kv_heads=1, head_dim=16, ffn_dim=64,
    vocab_size=128, layer_types=("conv", "attn", "conv", "attn"),
    max_seq_len=64, stop_token=127,
)

TINY_CODEC = NanoCodecConfig(
    base_channels=16, up_sample_rates=(2, 2), kernel_sizes=(3,),
    dilations=(1, 3), activation="half_snake",
)


def test_incremental_matches_batch_prefill():
    """Feeding N tokens one-by-one must give the same final logits as one
    N-token prefill — validates KV cache append, conv-state carry, rope
    positioning, and causal masking simultaneously."""
    params = init_params(TINY, jax.random.key(0))
    ids = jnp.asarray([[5, 17, 99, 3, 42, 7]], jnp.int32)

    step = jax.jit(lambda h, s: kani_step(params, h, s, TINY))

    # batch prefill
    state_b = init_state(TINY, kv_dtype=jnp.float32)
    logits_b, _ = step(embed_tokens(params, ids), state_b)

    # token-by-token
    state_i = init_state(TINY, kv_dtype=jnp.float32)
    for t in range(ids.shape[1]):
        logits_i, state_i = step(embed_tokens(params, ids[:, t:t + 1]), state_i)

    np.testing.assert_allclose(
        np.asarray(logits_b), np.asarray(logits_i), atol=2e-4
    )


def test_conv_layer_causality():
    """Changing a future token must not change logits at earlier steps."""
    params = init_params(TINY, jax.random.key(1))
    step = jax.jit(lambda h, s: kani_step(params, h, s, TINY))

    def logits_after(ids):
        state = init_state(TINY, kv_dtype=jnp.float32)
        outs = []
        for t in range(ids.shape[1]):
            lg, state = step(embed_tokens(params, ids[:, t:t + 1]), state)
            outs.append(np.asarray(lg))
        return outs

    a = logits_after(jnp.asarray([[1, 2, 3, 4]], jnp.int32))
    b = logits_after(jnp.asarray([[1, 2, 3, 100]], jnp.int32))
    np.testing.assert_allclose(a[2], b[2], atol=1e-5)
    assert np.abs(a[3] - b[3]).max() > 1e-6


def test_fsq_dequantize_matches_reference_math():
    """Golden check vs the reference's vectorized FSQ formula
    (Export_Kani_TTS.py:500-538) computed directly in numpy."""
    cfg = NanoCodecConfig()
    rng = np.random.default_rng(0)
    codes = rng.integers(0, cfg.codebook_size, size=(1, 6, 4)).astype(np.int32)
    out = np.asarray(fsq_dequantize(jnp.asarray(codes), cfg))

    base = np.array([1, 9, 72, 576], np.int32)
    levels = np.array([9, 8, 8, 7], np.int32)
    scale = np.array([4.0, 4.0, 4.0, 3.0], np.float32)
    offset = scale
    nonneg = (codes[..., None] // base) % levels               # (1, 6, 4, 4)
    ref = (nonneg / scale - offset / scale).reshape(1, 6, 16)
    np.testing.assert_allclose(out, ref.astype(np.float32), atol=1e-6)


def test_tokens_to_codes_layout():
    cfg = NanoCodecConfig()
    start = 1000
    # frame 0: codebook k holds token start + k*4032 + code
    flat = np.array([[start + 5, start + 4032 + 9, start + 2 * 4032 + 0,
                      start + 3 * 4032 + 77]], np.int32)
    codes = np.asarray(tokens_to_codes(jnp.asarray(flat), cfg, start))
    np.testing.assert_array_equal(codes[0, 0], [5, 9, 0, 77])


def test_hifigan_decode_shape_and_causality():
    params = codec_init(TINY_CODEC, jax.random.key(0))
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 16, TINY_CODEC.input_dim)).astype(np.float32)
    fn = jax.jit(lambda f: hifigan_decode(params, f, TINY_CODEC))
    y = np.asarray(fn(jnp.asarray(feats)))
    assert y.shape == (1, 16 * TINY_CODEC.total_upsample)
    # causal: perturbing the last frame leaves early samples unchanged
    feats2 = feats.copy()
    feats2[:, -1] += 10.0
    y2 = np.asarray(fn(jnp.asarray(feats2)))
    up = TINY_CODEC.total_upsample
    np.testing.assert_allclose(y[:, : 8 * up], y2[:, : 8 * up], atol=1e-5)


def test_kani_pipeline_greedy_smoke():
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    params = init_params(TINY, jax.random.key(2))
    cparams = codec_init(TINY_CODEC, jax.random.key(3))
    pipe = KaniPipeline(
        params, TINY, cparams, TINY_CODEC,
        KaniDecodeConfig(max_new_tokens=24, repeat_penalty=0.8,
                         penalty_range=4),
        audio_tokens_start=0,
    )
    ids = np.array([[3, 9, 27, 1]], np.int32)
    wav, stats = pipe.synthesize_ids(ids)
    wav2, _ = pipe.synthesize_ids(ids)
    assert wav.dtype == np.int16
    np.testing.assert_array_equal(wav, wav2)
    assert stats["tokens"] <= 24

    # int8 weight-only LM follows the same decode path
    pipe8 = KaniPipeline(
        params, TINY, cparams, TINY_CODEC,
        KaniDecodeConfig(max_new_tokens=24, repeat_penalty=0.8,
                         penalty_range=4),
        audio_tokens_start=0, quantize=8,
    )
    wav8, stats8 = pipe8.synthesize_ids(ids)
    assert wav8.dtype == np.int16
    assert stats8["tokens"] <= 24


def test_kani_pipeline_beam_smoke():
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    params = init_params(TINY, jax.random.key(4))
    cparams = codec_init(TINY_CODEC, jax.random.key(5))
    pipe = KaniPipeline(
        params, TINY, cparams, TINY_CODEC,
        KaniDecodeConfig(max_new_tokens=16, use_beam=True, beam_size=3,
                         top_k=3, repeat_penalty=1.0),
        audio_tokens_start=0,
    )
    wav, stats = pipe.synthesize_ids(np.array([[3, 9]], np.int32))
    assert wav.dtype == np.int16
    assert stats["tokens"] <= 16


def test_per_call_cap_matches_static_config():
    """synthesize_ids(max_new_tokens=N) must decode exactly like a pipeline
    whose static config caps at N: the cap rides as a dynamic arg into the
    bucketed fused program, so the same bucket serves both."""
    from tts_tpu.models.nanocodec import init_params as nc_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    params = init_params(TINY, jax.random.key(3))
    cparams = nc_init(TINY_CODEC, jax.random.key(4))
    big = KaniPipeline(params, TINY, cparams, TINY_CODEC,
                       KaniDecodeConfig(max_new_tokens=200))
    small = KaniPipeline(params, TINY, cparams, TINY_CODEC,
                         KaniDecodeConfig(max_new_tokens=20))
    ids = np.array([[3, 9, 27, 5]], np.int32)
    wav_cap, s_cap = big.synthesize_ids(ids, max_new_tokens=20)
    wav_cfg, s_cfg = small.synthesize_ids(ids)
    assert s_cap["tokens"] <= 20
    assert s_cap["tokens"] == s_cfg["tokens"]
    np.testing.assert_array_equal(wav_cap, wav_cfg)

    wavs, sb = big.synthesize_ids_batch([ids], max_new_tokens=20)
    np.testing.assert_array_equal(wavs[0], wav_cap)


def test_batched_decode_matches_single():
    """Each stream in a left-aligned batch must reproduce its single-stream
    greedy decode exactly: rope attention only sees relative offsets, the
    zeroed pad embeddings reproduce a fresh sequence's leading conv zeros,
    and key_valid_from masks the pad keys."""
    from tts_tpu.models.nanocodec import init_params as nc_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    params = init_params(TINY, jax.random.key(3))
    cparams = nc_init(TINY_CODEC, jax.random.key(4))
    pipe = KaniPipeline(params, TINY, cparams, TINY_CODEC,
                        KaniDecodeConfig(max_new_tokens=20))
    ids1 = np.array([[3, 9, 27, 5]], np.int32)
    ids2 = np.array([[7, 11, 2, 30, 14, 8]], np.int32)

    wav1, s1 = pipe.synthesize_ids(ids1)
    wav2, s2 = pipe.synthesize_ids(ids2)
    wavs, sb = pipe.synthesize_ids_batch([ids1, ids2])

    np.testing.assert_array_equal(wav1, wavs[0])
    np.testing.assert_array_equal(wav2, wavs[1])
    assert sb["tokens"] == s1["tokens"] + s2["tokens"]
