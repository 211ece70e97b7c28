"""Continuous batching for the VoxCPM dual-LM decode
(serving/continuous_voxcpm.VoxCPMSlotServer).

Key property beyond the other family adapters: every slot carries its OWN
PRNG key chain (split once per latent, like the solo decode), so a
request's CFM noise — and therefore its audio — is independent of when
it was admitted and which rows share the batch.
"""
import time

import jax
import numpy as np
import pytest

from tts_tpu.models.voxcpm import init_params, init_vae_params
from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline
from tts_tpu.serving.continuous_voxcpm import VoxCPMSlotServer

from test_voxcpm import TINY


def _pipeline(max_latents=6, min_latents=2):
    params = init_params(TINY, jax.random.key(0))
    vae = init_vae_params(TINY.vae, jax.random.key(1))
    return VoxCPMPipeline(params, TINY, vae,
                          VoxCPMDecodeConfig(max_latents=max_latents,
                                             min_latents=min_latents,
                                             retry_badcase=0))


@pytest.fixture(scope="module")
def pipe():
    return _pipeline()


P1 = np.array([[5, 9]], np.int32)
T1 = np.array([[11, 3, 7]], np.int32)
P2 = np.array([[2]], np.int32)
T2 = np.array([[8, 1, 4, 9]], np.int32)


def test_single_request_matches_pipeline(pipe):
    wav_ref, st = pipe.synthesize_ids(P1, T1, seed=5)
    srv = VoxCPMSlotServer(pipe, slots=2, chunk=2, prompt_bucket=16,
                           max_seq_len=128)
    try:
        wav, n = srv.submit(P1, T1, seed=5).result(timeout=300)
    finally:
        srv.close()
    assert n == st["latents"]
    np.testing.assert_array_equal(wav, wav_ref)


def test_mid_decode_admission_matches_solo(pipe):
    """A request admitted while another row is mid-decode reproduces its
    solo output: per-row key chains + the constant rope shift."""
    wav_solo, st = pipe.synthesize_ids(P2, T2, seed=9)

    srv = VoxCPMSlotServer(pipe, slots=2, chunk=2, prompt_bucket=16,
                           max_seq_len=128)
    try:
        fut_a = srv.submit(P1, T1, seed=5)
        deadline = time.time() + 120
        while srv.stats.chunks < 1 and time.time() < deadline:
            time.sleep(0.005)
        assert srv.stats.chunks >= 1
        fut_b = srv.submit(P2, T2, seed=9)
        wav, n = fut_b.result(timeout=300)
        # P1 caps at 6 latents (3 chunks): on a starved host it can
        # finish before B's admission — require a mid-decode admission
        # only when A was still in flight when B completed (same guard
        # as the other families' mid-decode tests); the output-equality
        # property below is unconditional either way.
        assert fut_a.done() or srv.stats.admissions_mid_decode >= 1
    finally:
        srv.close()
    assert n == st["latents"]
    np.testing.assert_array_equal(wav, wav_solo)


def test_segment_plan_matches_run_segments(pipe):
    """submit_segments (the v2 Assemble-mode plan format: interleaved
    text/audio segments + CFG feat_cond) reproduces the solo
    _run_segments path byte-for-byte."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    fe = (rng.normal(size=(1, 3, TINY.base.hidden_size))
          .astype(np.float32) * 0.1)
    fc = (rng.normal(size=(2, TINY.patch_size,
                           TINY.estimator.hidden_size))
          .astype(np.float32) * 0.1)
    segments = [("text", np.array([4, 6], np.int32)),
                ("audio", fe),
                ("text", np.array([9, TINY.audio_start_id], np.int32))]
    wav_solo, st = pipe._run_segments(segments, jnp.asarray(fc), 6,
                                      seed=13)

    srv = VoxCPMSlotServer(pipe, slots=2, chunk=2, prompt_bucket=16,
                           max_seq_len=128)
    try:
        wav, n = srv.submit_segments(segments, fc, 6,
                                     seed=13).result(timeout=300)
    finally:
        srv.close()
    assert n == st["latents"]
    np.testing.assert_array_equal(wav, wav_solo)


def test_queue_and_drain(pipe):
    """More requests than slots across a drain boundary all complete.
    kv budget 128, start pos 16, cap 6 latents, chunk 2: each serial
    request advances the shared counter by 6, so around the 18th the
    admission check (pos + 6 + 2 > 128) forces a drain."""
    srv = VoxCPMSlotServer(pipe, slots=1, chunk=2, prompt_bucket=16,
                           max_seq_len=128)
    try:
        futs = [srv.submit(P1, T1, seed=20 + i) for i in range(20)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        srv.close()
    assert all(n >= 1 and wav.dtype == np.int16 for wav, n in outs)
    assert srv.stats.snapshot()["completed"] == 20
    assert srv.stats.drains >= 1


def test_streaming_over_slots_matches_solo(pipe):
    """submit_stream over the slot batch byte-equals the solo
    synthesize_streaming generator for the same request (same VAE window
    program, same pairwise overlap-discard cadence at window=chunk+1)."""
    import jax.numpy as jnp

    segs = [("text", np.concatenate(
        [P1[0], T1[0], [TINY.audio_start_id]]).astype(np.int32))]
    zero_cond = jnp.zeros((2, TINY.patch_size, TINY.estimator.hidden_size))
    cap = T1.shape[1] * pipe.dcfg.decode_limit_factor + 10
    ref = np.concatenate(list(
        pipe.synthesize_streaming(segs, zero_cond, cap, seed=5, chunk=2)))

    srv = VoxCPMSlotServer(pipe, slots=2, chunk=2, prompt_bucket=16,
                           max_seq_len=128)
    try:
        handle = srv.submit_stream(P1, T1, seed=5)
        chunks = list(handle)
    finally:
        srv.close()
    assert handle.n_frames is not None and handle.n_frames >= 1
    assert len(chunks) >= 1
    np.testing.assert_array_equal(np.concatenate(chunks), ref)


def test_stream_shares_batch_with_plain_request(pipe):
    """A stream and a plain request decode concurrently in one slot batch;
    both reproduce their solo outputs."""
    import jax.numpy as jnp

    wav_solo, st = pipe.synthesize_ids(P2, T2, seed=9)
    segs = [("text", np.concatenate(
        [P1[0], T1[0], [TINY.audio_start_id]]).astype(np.int32))]
    zero_cond = jnp.zeros((2, TINY.patch_size, TINY.estimator.hidden_size))
    cap = T1.shape[1] * pipe.dcfg.decode_limit_factor + 10
    ref = np.concatenate(list(
        pipe.synthesize_streaming(segs, zero_cond, cap, seed=5, chunk=2)))

    srv = VoxCPMSlotServer(pipe, slots=2, chunk=2, prompt_bucket=16,
                           max_seq_len=128)
    try:
        handle = srv.submit_stream(P1, T1, seed=5)
        fut = srv.submit(P2, T2, seed=9)
        chunks = list(handle)
        wav, n = fut.result(timeout=300)
    finally:
        srv.close()
    np.testing.assert_array_equal(np.concatenate(chunks), ref)
    assert n == st["latents"]
    np.testing.assert_array_equal(wav, wav_solo)
