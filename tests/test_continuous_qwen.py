"""Continuous batching for the Qwen3-TTS two-level decode
(serving/continuous_qwen.QwenSlotServer).

Mirrors tests/test_continuous.py for the Kani adapter: single-request
output parity with the pipeline path, mid-decode admission that
completes without waiting for the batch, byte-equal frames for a
request admitted mid-decode vs decoded solo, and drain/reset when the
shared position counter runs out of headroom.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.qwen_codec import QwenCodecDecoderConfig
from tts_tpu.models.qwen_codec import init_decoder_params as codec_init
from tts_tpu.models.qwen_tts import (
    Qwen3StackConfig,
    QwenTTSConfig,
    init_predictor_params,
    init_talker_params,
)
from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline
from tts_tpu.serving.continuous_qwen import QwenSlotServer

# codec_eos_token_id -1 is unreachable (argmax is in [0, vocab)): random-
# weight greedy rows always run to their caps, making the mid-decode
# ordering assertions deterministic (same trick as test_continuous.py)
CFG = QwenTTSConfig(
    talker=Qwen3StackConfig(hidden_size=32, num_heads=2, num_kv_heads=1,
                            head_dim=16, ffn_dim=64, num_layers=2,
                            max_seq_len=1024),
    predictor=Qwen3StackConfig(hidden_size=24, num_heads=2, num_kv_heads=1,
                               head_dim=12, ffn_dim=48, num_layers=2,
                               max_seq_len=32),
    codec_vocab=64, group_vocab=32, num_code_groups=4,
    codec_eos_token_id=-1,
    codec_bos_id=61, codec_pad_id=60, codec_think_id=59,
    codec_think_bos_id=58, codec_think_eos_id=57,
    tts_bos_token_id=97, tts_eos_token_id=98, tts_pad_token_id=99,
    text_vocab=100, text_hidden=16,
)
CODEC = QwenCodecDecoderConfig(
    num_quantizers=4, codebook_size=32, codebook_dim=16, rvq_dim=8,
    latent_dim=24, decoder_dim=32, upsampling_ratios=(2,),
    upsample_rates=(4, 2), hidden_size=24, num_heads=2, num_kv_heads=2,
    head_dim=12, ffn_dim=48, num_layers=2, max_seq_len=64,
)


def _pipeline(max_frames=12):
    params = {
        **init_talker_params(CFG, jax.random.key(0)),
        **init_predictor_params(CFG, jax.random.key(1)),
    }
    cparams = codec_init(CODEC, jax.random.key(2))
    dcfg = QwenDecodeConfig(max_frames=max_frames)
    return QwenTTSPipeline(params, CFG, cparams, CODEC, dcfg)


def _request(seed, p=7, tt=5):
    h = CFG.talker.hidden_size
    rng = np.random.default_rng(seed)
    prefill = rng.normal(size=(1, p, h)).astype(np.float32) * 0.1
    trailing = rng.normal(size=(1, tt, h)).astype(np.float32) * 0.1
    return prefill, trailing


@pytest.fixture(scope="module")
def pipe():
    return _pipeline()


def test_single_request_matches_pipeline(pipe):
    prefill, trailing = _request(0)
    wav_ref, stats = pipe.synthesize_from_prefill(prefill, trailing)

    srv = QwenSlotServer(pipe, slots=2, chunk=4, prompt_bucket=32,
                         max_seq_len=256)
    try:
        wav, n = srv.submit(prefill, trailing).result(timeout=300)
    finally:
        srv.close()
    assert n == stats["frames"]
    assert wav.shape == wav_ref.shape
    # right-justified offset prefill vs left-justified pipeline prefill:
    # same frames (greedy + rope relative invariance), so the codec
    # output matches exactly
    np.testing.assert_array_equal(wav, wav_ref)


def test_mid_decode_admission_overtakes(pipe):
    """B admitted while A is mid-decode must finish long before A."""
    srv = QwenSlotServer(pipe, slots=2, chunk=4, prompt_bucket=32,
                         max_seq_len=256)
    try:
        fut_a = srv.submit(*_request(1))                 # cap 12
        deadline = time.time() + 120
        while srv.stats.chunks < 1 and time.time() < deadline:
            time.sleep(0.01)
        assert srv.stats.chunks >= 1, "A never started decoding"
        fut_b = srv.submit(*_request(2), max_frames=4)
        wav_b, n_b = fut_b.result(timeout=300)
        assert not fut_a.done() or srv.stats.admissions_mid_decode >= 1
        wav_a, n_a = fut_a.result(timeout=300)
        assert n_b == 4 and n_a == 12
        assert srv.stats.admissions_mid_decode >= 1
        assert srv.stats.snapshot()["completed"] == 2
    finally:
        srv.close()


def test_mid_decode_output_matches_solo(pipe):
    """The offset prefill + row splice must not change a request's
    frames: B decoded mid-batch == B decoded alone."""
    prefill_b, trailing_b = _request(3)
    wav_solo, stats = pipe.synthesize_from_prefill(prefill_b, trailing_b)

    srv = QwenSlotServer(pipe, slots=2, chunk=4, prompt_bucket=32,
                         max_seq_len=256)
    try:
        srv.submit(*_request(4))
        deadline = time.time() + 120
        while srv.stats.chunks < 1 and time.time() < deadline:
            time.sleep(0.01)
        wav_b, n_b = srv.submit(prefill_b, trailing_b).result(timeout=300)
    finally:
        srv.close()
    assert n_b == stats["frames"]
    np.testing.assert_array_equal(wav_b, wav_solo)


def test_streaming_over_slots(pipe):
    """submit_stream emits the same audio as the pipeline's reference
    streaming path (same ChunkedCodecStream window semantics over the
    same frames), while sharing the slot batch with a concurrent
    non-streaming request."""
    prefill, trailing = _request(5)
    ref_chunks = list(pipe.synthesize_streaming(
        prefill, trailing, chunk_frames=4, window=8, left_context=2))

    srv = QwenSlotServer(pipe, slots=2, chunk=4, prompt_bucket=32,
                         max_seq_len=256)
    try:
        fut_other = srv.submit(*_request(6))        # shares the batch
        handle = srv.submit_stream(prefill, trailing,
                                   window=8, left_context=2)
        chunks = list(handle)
        assert handle.n_frames == 12
        fut_other.result(timeout=300)
    finally:
        srv.close()
    assert len(chunks) >= 2                          # streamed, not one blob
    np.testing.assert_array_equal(np.concatenate(chunks),
                                  np.concatenate(ref_chunks))


def test_drain_and_reset():
    """When the shared position runs out of headroom the server drains,
    resets, and keeps serving — requests queued across the wrap all
    complete."""
    pipe = _pipeline(max_frames=12)
    # kv budget 128, bucket 32, cap 12, chunk 4: each generation moves the
    # shared counter by 12, so the 8th serial request cannot fit
    # (32 + 8*12 + 4 > 128) and must force a drain+reset
    srv = QwenSlotServer(pipe, slots=1, chunk=4, prompt_bucket=32,
                         max_seq_len=128)
    try:
        futs = [srv.submit(*_request(10 + i)) for i in range(10)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        srv.close()
    assert all(n == 12 for _, n in outs)
    assert srv.stats.drains >= 1
    assert srv.stats.snapshot()["completed"] == 10
