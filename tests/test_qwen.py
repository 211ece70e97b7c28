"""Qwen3-TTS: stack incremental consistency, suppress-bias semantics,
predictor frame scan, codec decode shapes, and pipeline smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.kv.cache import KVCache
from tts_tpu.models.qwen_codec import (
    QwenCodecDecoderConfig,
    codec_decode,
    init_decoder_params,
    rvq_dequantize,
)
from tts_tpu.models.qwen_tts import (
    Qwen3StackConfig,
    QwenTTSConfig,
    init_predictor_params,
    init_talker_params,
    make_suppress_bias,
    predictor_frame,
    qwen3_stack_step,
    talker_logits,
)

TINY = QwenTTSConfig(
    talker=Qwen3StackConfig(hidden_size=32, num_heads=2, num_kv_heads=1,
                            head_dim=16, ffn_dim=64, num_layers=2,
                            max_seq_len=1024),
    predictor=Qwen3StackConfig(hidden_size=24, num_heads=2, num_kv_heads=1,
                               head_dim=12, ffn_dim=48, num_layers=2,
                               max_seq_len=32),
    codec_vocab=64, group_vocab=32, num_code_groups=4, codec_eos_token_id=62,
    codec_bos_id=61, codec_pad_id=60, codec_think_id=59,
    codec_think_bos_id=58, codec_think_eos_id=57,
    tts_bos_token_id=97, tts_eos_token_id=98, tts_pad_token_id=99,
    text_vocab=100, text_hidden=16,
)

TINY_CODEC = QwenCodecDecoderConfig(
    num_quantizers=4, codebook_size=32, codebook_dim=16, rvq_dim=8,
    latent_dim=24, decoder_dim=32, upsampling_ratios=(2,),
    upsample_rates=(4, 2), hidden_size=24, num_heads=2, num_kv_heads=2,
    head_dim=12, ffn_dim=48, num_layers=2, max_seq_len=64,
)


def test_stack_incremental_matches_batch():
    params = init_talker_params(TINY, jax.random.key(0))
    t = TINY.talker
    hidden = jax.random.normal(jax.random.key(1), (1, 5, t.hidden_size))
    step = jax.jit(lambda h, kv, rc, rs: qwen3_stack_step(
        params["talker"], h, kv, t, rc, rs))

    kv = KVCache.create(t.num_layers, 1, t.num_kv_heads, 64, t.head_dim,
                        jnp.float32)
    h_b, _ = step(hidden, kv, params["rope_cos"][:5], params["rope_sin"][:5])

    kv = KVCache.create(t.num_layers, 1, t.num_kv_heads, 64, t.head_dim,
                        jnp.float32)
    for i in range(5):
        h_i, kv = step(hidden[:, i:i + 1], kv, params["rope_cos"][i:i + 1],
                       params["rope_sin"][i:i + 1])
    np.testing.assert_allclose(np.asarray(h_b), np.asarray(h_i), atol=2e-4)


def test_suppress_bias():
    """Reference :931-938 — last 1024 ids masked except EOS."""
    bias = make_suppress_bias(3072, 2150)
    assert bias[0, 2150] == 0.0
    assert bias[0, 3071] == -1e7
    assert bias[0, 2048 - 1] == 0.0
    assert (bias[0, 2048:2150] == -1e7).all()
    # degenerate tiny vocab: no masking
    assert (make_suppress_bias(64, 62) == 0).all()


def test_predictor_frame_shapes():
    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    hid = jax.random.normal(jax.random.key(2), (1, 1, TINY.talker.hidden_size))
    tok0 = jnp.asarray([7], jnp.int32)
    frame_ids, ce0 = jax.jit(
        lambda h, t: predictor_frame(params, h, t, TINY))(hid, tok0)
    assert frame_ids.shape == (TINY.num_code_groups,)
    assert int(frame_ids[0]) == 7
    assert (np.asarray(frame_ids[1:]) < TINY.group_vocab).all()
    assert ce0.shape == (1, 1, TINY.talker.hidden_size)


def test_predictor_frame_beam_matches_greedy_at_beam1():
    """beam_size=1, top_k=1 degenerates to argmax at every group, so the
    beam path must reproduce the greedy scan exactly (the reference's
    FIRST/SECOND_BEAM graphlets with k=1, Export_Qwen_TTS_ONNX.py:2528-2552)."""
    from tts_tpu.models.qwen_tts import predictor_frame_beam

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    hid = jax.random.normal(jax.random.key(2), (1, 1, TINY.talker.hidden_size))
    tok0 = jnp.asarray([3], jnp.int32)
    greedy_ids, _ = jax.jit(
        lambda h, t: predictor_frame(params, h, t, TINY))(hid, tok0)
    beam_ids, ce0 = jax.jit(
        lambda h, t: predictor_frame_beam(params, h, t, TINY, 1, 1))(hid, tok0)
    np.testing.assert_array_equal(np.asarray(greedy_ids), np.asarray(beam_ids))
    assert ce0.shape == (1, 1, TINY.talker.hidden_size)


def test_predictor_frame_beam_shapes():
    from tts_tpu.models.qwen_tts import predictor_frame_beam

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    hid = jax.random.normal(jax.random.key(5), (1, 1, TINY.talker.hidden_size))
    tok0 = jnp.asarray([2], jnp.int32)
    frame_ids, ce0 = jax.jit(
        lambda h, t: predictor_frame_beam(params, h, t, TINY, 3, 2,
                                          repeat_penalty=0.9))(hid, tok0)
    assert frame_ids.shape == (TINY.num_code_groups,)
    assert int(frame_ids[0]) == 2
    assert (np.asarray(frame_ids[1:]) < TINY.group_vocab).all()


def test_rvq_dequantize_split_semantics():
    """Group 0 goes through the semantic path, others through acoustic —
    changing group 0 must not change the acoustic component."""
    params = init_decoder_params(TINY_CODEC, jax.random.key(0))
    codes = jnp.zeros((1, 3, 4), jnp.int32)
    a = np.asarray(rvq_dequantize(params, codes))
    b = np.asarray(rvq_dequantize(params, codes.at[..., 0].set(5)))
    c = np.asarray(rvq_dequantize(params, codes.at[..., 1].set(5)))
    assert np.abs(a - b).max() > 0          # semantic path changed
    assert np.abs(a - c).max() > 0          # acoustic path changed
    # semantic delta is the same regardless of acoustic codes
    d = np.asarray(rvq_dequantize(params, codes.at[..., 1].set(9)))
    e = np.asarray(
        rvq_dequantize(params, codes.at[..., 1].set(9).at[..., 0].set(5)))
    np.testing.assert_allclose(e - d, b - a, atol=1e-6)


def test_codec_decode_shape():
    params = init_decoder_params(TINY_CODEC, jax.random.key(0))
    codes = jax.random.randint(jax.random.key(1), (1, 10, 4), 0, 32)
    wav = jax.jit(lambda c: codec_decode(params, c, TINY_CODEC))(codes)
    assert wav.shape == (1, 10 * TINY_CODEC.total_upsample)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_qwen_pipeline_smoke():
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    cparams = init_decoder_params(TINY_CODEC, jax.random.key(2))
    pipe = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                           QwenDecodeConfig(max_frames=6))
    ids = np.array([[5, 9, 13, 2]], np.int32)
    wav, stats = pipe.synthesize_ids(ids, language_id=3)
    wav2, _ = pipe.synthesize_ids(ids, language_id=3)
    assert wav.dtype == np.int16
    np.testing.assert_array_equal(wav, wav2)
    assert stats["frames"] <= 6

    pipe8 = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                            QwenDecodeConfig(max_frames=6), quantize=8)
    wav8, stats8 = pipe8.synthesize_ids(ids, language_id=3)
    assert wav8.dtype == np.int16
    assert stats8["frames"] <= 6

    pipe_b = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                             QwenDecodeConfig(max_frames=6, use_beam=True,
                                              beam_size=2, beam_top_k=2))
    wav_b, stats_b = pipe_b.synthesize_ids(ids, language_id=3)
    assert wav_b.dtype == np.int16
    assert stats_b["frames"] <= 6


def test_qwen_batched_decode_matches_single():
    """Each stream in the batch must reproduce its single-request decode:
    right-justified prefills only shift rope by a constant (relative
    attention), per-row kv_valid masks the pad keys."""
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    cparams = init_decoder_params(TINY_CODEC, jax.random.key(2))
    pipe = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                           QwenDecodeConfig(max_frames=6))
    reqs = []
    singles = []
    for ids, lang in ((np.array([[5, 9, 13, 2]], np.int32), 3),
                      (np.array([[7, 1, 4]], np.int32), 2)):
        prefill, trailing = pipe.build_prefill_embeds(ids, lang)
        reqs.append((prefill, trailing))
        singles.append(pipe.synthesize_from_prefill(prefill, trailing))

    wavs, stats = pipe.synthesize_from_prefill_batch(reqs)
    for (wav_s, st_s), wav_b in zip(singles, wavs):
        np.testing.assert_array_equal(wav_s, wav_b)
    assert stats["frames"] == sum(st["frames"] for _, st in singles)


def test_qwen_batched_single_request():
    """Regression: predictor_frame squeezes to (16,) at B=1 — the batch
    path must re-rank and work for a one-request batch."""
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    cparams = init_decoder_params(TINY_CODEC, jax.random.key(2))
    pipe = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                           QwenDecodeConfig(max_frames=4))
    prefill, trailing = pipe.build_prefill_embeds(
        np.array([[5, 9]], np.int32), 3)
    single, st = pipe.synthesize_from_prefill(prefill, trailing)
    batch, sb = pipe.synthesize_from_prefill_batch([(prefill, trailing)])
    np.testing.assert_array_equal(single, batch[0])


def test_qwen_batched_beam_matches_single_beam():
    """VERDICT r1 item 6: batched serving with use_beam runs per-request
    beams as (B*beam) predictor rows — bit-equal to the single-stream beam
    decode at B=1 and per-row at B>1."""
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    cparams = init_decoder_params(TINY_CODEC, jax.random.key(2))
    pipe = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                           QwenDecodeConfig(max_frames=5, use_beam=True,
                                            beam_size=2, beam_top_k=2))
    reqs, singles = [], []
    for ids, lang in ((np.array([[5, 9, 13, 2]], np.int32), 3),
                      (np.array([[7, 1, 4]], np.int32), 2)):
        prefill, trailing = pipe.build_prefill_embeds(ids, lang)
        reqs.append((prefill, trailing))
        singles.append(pipe.synthesize_from_prefill(prefill, trailing))

    # B=1: bit-wise identical to the single-stream beam decode
    b1, _ = pipe.synthesize_from_prefill_batch(reqs[:1])
    np.testing.assert_array_equal(singles[0][0], b1[0])

    # B=2: each row reproduces its own single-stream beam decode
    wavs, stats = pipe.synthesize_from_prefill_batch(reqs)
    for (wav_s, st_s), wav_b in zip(singles, wavs):
        np.testing.assert_array_equal(wav_s, wav_b)
    assert stats["frames"] == sum(st["frames"] for _, st in singles)


def test_predictor_frame_beam_batch_row_equivalence():
    """predictor_frame_beam_batch row b == predictor_frame_beam on request
    b (same beams, same winner)."""
    from tts_tpu.models.qwen_tts import (predictor_frame_beam,
                                         predictor_frame_beam_batch)

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    hid = jax.random.normal(jax.random.key(7), (3, 1, TINY.talker.hidden_size))
    tok0 = jnp.asarray([3, 11, 40], jnp.int32)
    ids_b, ce_b = jax.jit(
        lambda h, t: predictor_frame_beam_batch(params, h, t, TINY, 3, 2,
                                                1.2, 4))(hid, tok0)
    assert ids_b.shape == (3, TINY.num_code_groups)
    for b in range(3):
        ids_s, ce_s = jax.jit(
            lambda h, t: predictor_frame_beam(params, h, t, TINY, 3, 2,
                                              1.2, 4)
        )(hid[b:b + 1], tok0[b:b + 1])
        np.testing.assert_array_equal(np.asarray(ids_b[b]),
                                      np.asarray(ids_s))
        np.testing.assert_allclose(np.asarray(ce_b[b]),
                                   np.asarray(ce_s[0]), atol=0)
