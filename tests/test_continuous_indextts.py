"""Continuous batching for the IndexTTS AR decode
(serving/continuous_indextts.IndexTTSSlotServer).

Mirrors tests/test_continuous.py: single-request parity with the
pipeline path, mid-decode admission completing without waiting for the
batch, token-equal output for a request admitted mid-decode vs decoded
solo (sound because this GPT-2 carries no positional encoding of its
own — only external learned tables), and drain/reset.
"""
import dataclasses as dc
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.bigvgan import BigVGANConfig
from tts_tpu.models.bigvgan import init_params as bigvgan_init
from tts_tpu.models.indextts import (
    init_conformer_params,
    init_ecapa_params,
    init_gpt_params,
    init_perceiver_params,
)
from tts_tpu.runtime.indextts import IndexTTSPipeline
from tts_tpu.serving.continuous_indextts import IndexTTSSlotServer

from test_indextts import TINY

# stop_token -1 is unreachable (argmax is in [0, num_mel_codes)): rows
# always run to their caps, making the ordering assertions deterministic
CFG = dc.replace(TINY, stop_token=-1, max_seq_len=512)


def _pipeline():
    vcfg = BigVGANConfig(
        num_mels=CFG.gpt_dim, upsample_initial_channel=16,
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        use_tanh_at_final=True, use_bias_at_final=True,
    )
    key = jax.random.key(0)
    ks = jax.random.split(key, 8)
    c0 = vcfg.upsample_initial_channel
    params = {
        "conformer": init_conformer_params(CFG, ks[0]),
        "perceiver": init_perceiver_params(CFG, ks[1]),
        "ecapa": init_ecapa_params(CFG, ks[2]),
        "gpt": init_gpt_params(CFG, ks[3]),
        "bigvgan": bigvgan_init(vcfg, ks[4]),
        "cond_layer": {
            "w": jax.random.normal(ks[5], (CFG.speaker_embed_dim, c0)) * 0.02,
            "b": jnp.zeros((c0,)),
        },
        "conds": [
            {"w": jax.random.normal(ks[6], (CFG.speaker_embed_dim, c)) * 0.02,
             "b": jnp.zeros((c,))}
            for c in vcfg.stage_channels
        ],
    }
    return IndexTTSPipeline(params, CFG, vcfg, sample_rate=8000,
                            n_fft=256, hop=64)


@pytest.fixture(scope="module")
def pipe():
    return _pipeline()


@pytest.fixture(scope="module")
def ref(pipe):
    rng = np.random.default_rng(0)
    return pipe.encode_reference(
        (rng.standard_normal(4000) * 3000).astype(np.int16))


def test_single_request_matches_pipeline(pipe, ref):
    ids = np.array([[5, 9, 13]], np.int32)
    # solo bucket: max(16, round16(3)) = 16 == server text_bucket, so the
    # learned text positions and kv-hole layout are identical
    wav_ref, stats = pipe.synthesize_ids(ids, ref, max_gen=12)

    srv = IndexTTSSlotServer(pipe, slots=2, chunk=4, text_bucket=16,
                             max_gen=12, max_seq_len=256)
    try:
        wav, n = srv.submit(ids, ref).result(timeout=300)
    finally:
        srv.close()
    assert n == stats.tokens
    np.testing.assert_array_equal(wav, wav_ref)


def test_mid_decode_admission_overtakes(pipe, ref):
    srv = IndexTTSSlotServer(pipe, slots=2, chunk=4, text_bucket=16,
                             max_gen=16, max_seq_len=256)
    try:
        fut_a = srv.submit(np.array([[5, 9, 13]], np.int32), ref)  # cap 16
        deadline = time.time() + 120
        while srv.stats.chunks < 1 and time.time() < deadline:
            time.sleep(0.01)
        assert srv.stats.chunks >= 1, "A never started decoding"
        fut_b = srv.submit(np.array([[2, 7]], np.int32), ref, max_gen=6)
        wav_b, n_b = fut_b.result(timeout=300)
        assert not fut_a.done() or srv.stats.admissions_mid_decode >= 1
        wav_a, n_a = fut_a.result(timeout=300)
        assert n_b == 6 and n_a == 16
        assert srv.stats.admissions_mid_decode >= 1
        assert srv.stats.snapshot()["completed"] == 2
    finally:
        srv.close()


def test_mid_decode_output_matches_solo(pipe, ref):
    ids_b = np.array([[2, 7, 4]], np.int32)
    wav_solo, stats = pipe.synthesize_ids(ids_b, ref, max_gen=12)

    srv = IndexTTSSlotServer(pipe, slots=2, chunk=4, text_bucket=16,
                             max_gen=12, max_seq_len=256)
    try:
        srv.submit(np.array([[5, 9, 13]], np.int32), ref)
        deadline = time.time() + 120
        while srv.stats.chunks < 1 and time.time() < deadline:
            time.sleep(0.01)
        wav_b, n_b = srv.submit(ids_b, ref).result(timeout=300)
    finally:
        srv.close()
    assert n_b == stats.tokens
    np.testing.assert_array_equal(wav_b, wav_solo)


def test_drain_and_reset(pipe, ref):
    """p_len = 2 + 16 + 3 = 21 (num_latents 2), kv budget 128, cap 12,
    chunk 4: each generation advances the shared counter by 12, so after
    a few serial requests the next cannot fit and forces a drain."""
    srv = IndexTTSSlotServer(pipe, slots=1, chunk=4, text_bucket=16,
                             max_gen=12, max_seq_len=128)
    try:
        futs = [srv.submit(np.array([[3 + i]], np.int32), ref)
                for i in range(12)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        srv.close()
    assert all(n == 12 for _, n in outs)
    assert srv.stats.drains >= 1
    assert srv.stats.snapshot()["completed"] == 12
