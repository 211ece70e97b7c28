"""Continuous batching for the F5 flow-matching decode
(serving/continuous_f5.F5SlotServer).

The diffusion variant of the slot-server contract: per-row NFE step
indices (models/f5.dit_forward step-vector mode) mean a request admitted
mid-flight integrates its own schedule. With the server's frame bucket
equal to the bucket _prepare picks solo, the output is byte-equal to
synthesize() (same per-request noise key at the same shape, per-row
duration masks keep pad frames inert).
"""
import time

import jax
import numpy as np
import pytest

from tts_tpu.models.f5 import init_params
from tts_tpu.models.vocos import VocosConfig
from tts_tpu.models.vocos import init_params as vocos_init
from tts_tpu.runtime.f5 import F5Pipeline
from tts_tpu.serving.continuous_f5 import F5SlotServer

from test_f5 import TINY


def _pipeline():
    vocab = {c: i for i, c in enumerate("abcdefghij ")}
    vcfg = VocosConfig(input_channels=TINY.n_mels, dim=32,
                       intermediate_dim=64, num_layers=2, n_fft=TINY.n_fft,
                       hop=TINY.hop, sample_rate=TINY.sample_rate)
    return F5Pipeline(init_params(TINY, jax.random.key(0)), TINY, vocab,
                      vocos_init(vcfg, jax.random.key(1)), vcfg)


@pytest.fixture(scope="module")
def pipe():
    return _pipeline()


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    return (rng.standard_normal(2000) * 3000).astype(np.int16)


def _server(pipe, slots=2, chunk_steps=1):
    # frames=128 == the bucket _prepare picks for these requests
    # (TINY.max_signal_len clamps), so slot output == solo output
    return F5SlotServer(pipe, slots=slots, chunk_steps=chunk_steps,
                        frames=128, audio_bucket=32768, text_bucket=64)


def test_single_request_matches_pipeline(pipe, audio):
    wav_ref, _ = pipe.synthesize(audio, "abc def", "hij abc", seed=7)
    srv = _server(pipe)
    try:
        wav, n = srv.submit(audio, "abc def", "hij abc",
                            seed=7).result(timeout=300)
    finally:
        srv.close()
    assert n == len(wav_ref)
    np.testing.assert_array_equal(wav, wav_ref)


def test_mid_flight_admission_matches_solo(pipe, audio):
    """A request spliced into a batch whose other row is mid-integration
    must produce its exact solo output (per-row step indices + per-row
    AdaLN gathers)."""
    wav_solo, _ = pipe.synthesize(audio, "abc def", "gij fab", seed=11)

    srv = _server(pipe, slots=2, chunk_steps=1)
    try:
        srv.submit(audio, "abc def", "hij abc", seed=7)
        deadline = time.time() + 120
        while srv.stats.chunks < 1 and time.time() < deadline:
            time.sleep(0.005)
        assert srv.stats.chunks >= 1
        wav, n = srv.submit(audio, "abc def", "gij fab",
                            seed=11).result(timeout=300)
    finally:
        srv.close()
    assert srv.stats.admissions_mid_decode >= 1
    assert n == len(wav_solo)
    np.testing.assert_array_equal(wav, wav_solo)


def test_queue_past_slots_all_complete(pipe, audio):
    srv = _server(pipe, slots=2, chunk_steps=2)
    texts = ["hij abc", "gij fab", "abc fgh", "jih cba", "bca hij"]
    try:
        futs = [srv.submit(audio, "abc def", t, seed=3 + i)
                for i, t in enumerate(texts)]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        srv.close()
    assert all(n > 0 and wav.dtype == np.int16 for wav, n in outs)
    assert srv.stats.snapshot()["completed"] == len(texts)
