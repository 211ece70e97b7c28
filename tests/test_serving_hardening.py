"""Serving robustness (VERDICT r3 item 7): per-request deadlines,
cancellation, and SlotRouter failover.

Deadline/cancel contract (serving/slots.SlotEngine):
  * submit(..., deadline_s=T): queued requests expire without occupying
    a slot; live rows are killed at the next chunk boundary; the future
    fails with TimeoutError either way.
  * future.cancel() is honoured at the same boundaries and frees the
    slot; the engine keeps serving, and output of surviving requests is
    unchanged (the killed row is inert, its slot fully overwritten on
    the next admission).

Failover contract (serving/router.SlotRouter):
  * when one server's worker crashes mid-decode, its unfinished
    requests re-route to survivors with their ORIGINAL futures and
    complete byte-equal to solo decodes;
  * the dead server is excluded from routing; submits keep working;
  * streams that already delivered audio fail instead of replaying
    (duplicate chunks), streams that have not yet emitted re-route.
"""
import threading
import time

import jax
import numpy as np
import pytest

from tts_tpu.models.kani import KaniConfig, init_params
from tts_tpu.models.nanocodec import NanoCodecConfig
from tts_tpu.models.nanocodec import init_params as codec_init
from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline
from tts_tpu.serving.continuous import KaniSlotServer
from tts_tpu.serving.router import SlotRouter

CFG = KaniConfig(
    hidden_size=32, num_heads=2, num_kv_heads=1, head_dim=16, ffn_dim=64,
    vocab_size=128, layer_types=("conv", "attn"), max_seq_len=512,
    stop_token=-1,
)
CODEC = NanoCodecConfig(
    base_channels=16, up_sample_rates=(2, 2), kernel_sizes=(3,),
    dilations=(1, 3), activation="half_snake",
)


def _pipeline(max_new_tokens=40):
    params = init_params(CFG, jax.random.key(0))
    cparams = codec_init(CODEC, jax.random.key(1))
    return KaniPipeline(params, CFG, cparams, CODEC,
                        KaniDecodeConfig(max_new_tokens=max_new_tokens))


@pytest.fixture(scope="module")
def pipe():
    return _pipeline()


IDS = np.array([[5, 17, 99, 3]], np.int32)


def _wait(cond, timeout=120):
    deadline = time.time() + timeout
    while not cond() and time.time() < deadline:
        time.sleep(0.01)
    assert cond(), "condition never became true"


class _SlowKani(KaniSlotServer):
    """Chunk steps sleep so deadlines/cancels land mid-decode
    deterministically."""

    chunk_sleep = 0.15

    def _step_chunk(self, s):
        time.sleep(self.chunk_sleep)
        super()._step_chunk(s)


def test_deadline_expires_queued_request(pipe):
    """A queued request whose deadline passes before admission fails
    with TimeoutError and never occupies a slot."""
    srv = _SlowKani(pipe, slots=1, chunk=8, prompt_bucket=16)
    try:
        fut_live = srv.submit(IDS, max_new_tokens=40)
        _wait(lambda: srv.stats.chunks >= 1)
        # slots=1 and the live row has ~5 chunks left: this cannot admit
        # before its 1 ms deadline
        fut_q = srv.submit(IDS, max_new_tokens=8, deadline_s=0.001)
        with pytest.raises(TimeoutError, match="queued"):
            fut_q.result(timeout=120)
        wav, n = fut_live.result(timeout=300)   # live request unharmed
        assert n == 40
        assert srv.stats.deadline_expired == 1
    finally:
        srv.close()


def test_deadline_kills_live_row_and_slot_is_reusable(pipe):
    """A live row whose deadline passes is killed at a chunk boundary;
    the freed slot serves a later request whose output byte-equals the
    solo decode."""
    wav_ref, stats = pipe.synthesize_ids(IDS, max_new_tokens=24)
    srv = _SlowKani(pipe, slots=1, chunk=4, prompt_bucket=16)
    try:
        fut_dead = srv.submit(IDS, max_new_tokens=40, deadline_s=0.3)
        with pytest.raises(TimeoutError, match="mid-decode"):
            fut_dead.result(timeout=120)
        assert srv.stats.deadline_expired == 1
        wav, n = srv.submit(IDS, max_new_tokens=24).result(timeout=300)
        assert n == stats["tokens"]
        np.testing.assert_array_equal(wav, wav_ref)
    finally:
        srv.close()


def test_cancel_queued_and_live(pipe):
    srv = _SlowKani(pipe, slots=1, chunk=4, prompt_bucket=16)
    try:
        fut_live = srv.submit(IDS, max_new_tokens=40)
        _wait(lambda: srv.stats.chunks >= 1)
        fut_q = srv.submit(IDS, max_new_tokens=8)
        assert fut_q.cancel()                       # still queued
        fut_live.cancel()                           # mid-decode
        _wait(lambda: srv.stats.cancelled == 2)
        # engine still serves after both cancellations
        wav, n = srv.submit(IDS, max_new_tokens=8).result(timeout=300)
        assert n == 8 and len(wav)
        snap = srv.stats.snapshot()
        assert snap["cancelled"] == 2
    finally:
        srv.close()


def test_cancel_does_not_corrupt_surviving_rows(pipe):
    """Cancel one of two concurrent rows mid-decode: the survivor's
    output must byte-equal its solo decode."""
    wav_ref, stats = pipe.synthesize_ids(IDS, max_new_tokens=40)
    srv = _SlowKani(pipe, slots=2, chunk=4, prompt_bucket=16)
    try:
        fut_a = srv.submit(IDS, max_new_tokens=40)
        fut_b = srv.submit(np.array([[8, 9]], np.int32), max_new_tokens=40)
        _wait(lambda: srv.stats.chunks >= 2)
        fut_b.cancel()
        wav, n = fut_a.result(timeout=300)
        assert n == stats["tokens"]
        np.testing.assert_array_equal(wav, wav_ref)
    finally:
        srv.close()


# ------------------------------------------------------------- failover


class _FusedKani(KaniSlotServer):
    """Server whose chunk program can be detonated externally."""

    def __init__(self, *a, **kw):
        self.bomb = threading.Event()
        self.chunks_run = 0
        super().__init__(*a, **kw)

    def _step_chunk(self, s):
        time.sleep(0.1)
        if self.bomb.is_set():
            raise RuntimeError("simulated device failure")
        self.chunks_run += 1
        super()._step_chunk(s)


def test_router_failover_replays_on_survivor(pipe):
    """Kill one of two servers mid-decode: every request completes
    byte-equal to solo, served by the survivor with original futures."""
    wav_ref, stats = pipe.synthesize_ids(IDS, max_new_tokens=32)
    srv_a = _FusedKani(pipe, slots=2, chunk=4, prompt_bucket=16)
    srv_b = _FusedKani(pipe, slots=2, chunk=4, prompt_bucket=16)
    router = SlotRouter([srv_a, srv_b])
    try:
        futs = [router.submit(IDS, max_new_tokens=32) for _ in range(4)]
        _wait(lambda: srv_a.chunks_run >= 1 and srv_b.chunks_run >= 1)
        srv_a.bomb.set()                        # kill server A mid-decode
        for fut in futs:
            wav, n = fut.result(timeout=300)    # original futures resolve
            assert n == stats["tokens"]
            np.testing.assert_array_equal(wav, wav_ref)
        _wait(lambda: not srv_a.healthy, timeout=30)
        st = router.stats()
        assert st["healthy_servers"] == 1
        assert st["failovers"] == 1
        assert st["failover_requests"] >= 1
        # routing continues on the survivor
        wav, n = router.submit(IDS, max_new_tokens=32).result(timeout=300)
        np.testing.assert_array_equal(wav, wav_ref)
    finally:
        router.close()


def test_router_all_dead_fails_loud(pipe):
    srv = _FusedKani(pipe, slots=1, chunk=4, prompt_bucket=16)
    router = SlotRouter([srv])
    try:
        fut = router.submit(IDS, max_new_tokens=32)
        srv.bomb.set()
        with pytest.raises(RuntimeError, match="simulated device failure"):
            fut.result(timeout=120)
        _wait(lambda: not srv.healthy, timeout=30)
        with pytest.raises(RuntimeError, match="no healthy slot server"):
            router.submit(IDS, max_new_tokens=8)
    finally:
        router.close()


def test_router_failover_unemitted_stream_replays(pipe):
    """A streaming request that has NOT yet delivered audio re-routes on
    failover and streams the complete audio from the survivor."""
    wav_ref, stats = pipe.synthesize_ids(IDS, max_new_tokens=32)
    srv_a = _FusedKani(pipe, slots=1, chunk=4, prompt_bucket=16)
    srv_b = _FusedKani(pipe, slots=1, chunk=4, prompt_bucket=16)
    router = SlotRouter([srv_a, srv_b])
    try:
        # occupy B so the stream lands on A (both idle: least-loaded is A,
        # the first listed — then load B explicitly to be deterministic)
        busy = srv_b.submit(IDS, max_new_tokens=32)
        _wait(lambda: srv_b.in_flight == 1)
        handle = router.submit_stream(IDS, max_new_tokens=32,
                                      window=24, left_context=8)
        assert srv_a.in_flight == 1, "stream did not land on server A"
        srv_a.bomb.set()                        # kill before audio flows
        chunks = list(handle)                   # replayed on B
        wav = np.concatenate(chunks)
        np.testing.assert_array_equal(wav, wav_ref)
        busy.result(timeout=300)
    finally:
        router.close()


def test_http_deadline_maps_to_504_and_frees_slot(pipe):
    """VERDICT r4 item 4: the HTTP layer passes deadline_s through to
    SlotEngine.submit, so an expired request returns 504 AND its slot is
    freed (not a client-side future timeout that leaves the row
    decoding). A follow-up request on the same server succeeds."""
    import json
    from urllib import error, request as urlreq

    from tts_tpu.serving.families import continuous_server
    from tts_tpu.serving.server import serve_http

    srv = continuous_server("kani", pipe, slots=2, chunk=4,
                            prompt_bucket=8)
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        def post(body):
            req = urlreq.Request(
                f"http://{host}:{port}/synthesize",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            return urlreq.urlopen(req, timeout=300)

        # warm/compile so the deadline below measures decode, not compile
        with post({"ids": IDS.tolist()}) as r:
            assert r.status == 200

        with pytest.raises(error.HTTPError) as ei:
            post({"ids": IDS.tolist(), "deadline_s": 1e-3})
        assert ei.value.code == 504

        snap = srv.stats()
        assert snap["deadline_expired"] >= 1

        # the expired row's slot is reusable: a normal request completes
        with post({"ids": IDS.tolist()}) as r:
            assert r.status == 200
            assert len(r.read()) > 44
    finally:
        httpd.shutdown()
        srv.close()
