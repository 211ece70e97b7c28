"""Serving layer: micro-batching semantics, padding ladder, error
propagation, and an end-to-end HTTP round trip over a tiny KaniPipeline
(CPU) — each served waveform must equal the batched pipeline run alone."""
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from tts_tpu.serving import MicroBatcher, TTSServer, serve_http


def _echo_batch(reqs):
    return [r * 2 for r in reqs]


def test_batcher_groups_concurrent_requests():
    calls = []

    def fn(reqs):
        calls.append(len(reqs))
        time.sleep(0.05)          # hold the worker so submits pile up
        return list(reqs)

    mb = MicroBatcher(fn, max_batch=4, max_wait_ms=100.0,
                      batch_sizes=(1, 2, 4), pad_request=0)
    futs = [mb.submit(i) for i in range(5)]
    assert [f.result(timeout=10) for f in futs] == list(range(5))
    mb.close()
    # first batch takes >= 1 request; the rest group into <= 2 more calls
    assert len(calls) <= 3
    assert sum(min(c, 4) for c in calls) >= 5
    s = mb.stats.snapshot()
    assert s["requests"] == 5 and s["batches"] == len(calls)


def test_batcher_pads_to_ladder_and_drops_pad_outputs():
    seen = []
    gate = threading.Event()

    def fn(reqs):
        seen.append(list(reqs))
        assert len(reqs) in (1, 2, 4)
        if len(seen) == 1:
            gate.wait(5)            # hold batch #1 until the trio queues
        return [r + 1 for r in reqs]

    mb = MicroBatcher(fn, max_batch=4, max_wait_ms=50.0,
                      batch_sizes=(1, 2, 4), pad_request=100)
    blocker = mb.submit(0)          # worker takes this alone (1-wide)
    while not seen:                 # ensure batch #1 started
        time.sleep(0.001)
    f1, f2, f3 = (mb.submit(i) for i in (1, 2, 3))
    gate.set()
    assert blocker.result(10) == 1
    assert [f1.result(10), f2.result(10), f3.result(10)] == [2, 3, 4]
    mb.close()
    # the 3-wide group rounded up to 4 with the pad request appended
    assert mb.stats.padded_rows == 1
    assert [g for g in seen if len(g) == 4 and g[3] == 100]


def test_batcher_propagates_errors_to_all_futures():
    def fn(reqs):
        raise ValueError("boom")

    mb = MicroBatcher(fn, max_batch=2, max_wait_ms=30.0,
                      batch_sizes=(1, 2), pad_request=0)
    f1 = mb.submit(1)
    f2 = mb.submit(2)
    for f in (f1, f2):
        with pytest.raises(ValueError, match="boom"):
            f.result(timeout=10)
    assert mb.stats.failures >= 1
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(3)


def test_batcher_rejects_bad_ladder():
    with pytest.raises(ValueError):
        MicroBatcher(_echo_batch, max_batch=8, batch_sizes=(1, 2, 4),
                     pad_request=0)
    with pytest.raises(ValueError):
        MicroBatcher(_echo_batch, max_batch=4, batch_sizes=(1, 2, 4))


@pytest.fixture(scope="module")
def kani_pipe():
    import jax

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
    return KaniPipeline(init_params(cfg, jax.random.key(0)), cfg,
                        nc_init(ccfg, jax.random.key(1)), ccfg,
                        KaniDecodeConfig(max_new_tokens=12),
                        audio_tokens_start=0), ccfg


def test_tts_server_matches_direct_batch(kani_pipe):
    pipe, ccfg = kani_pipe
    reqs = [np.array([[3 + b, 9, 5]], np.int32) for b in range(3)]
    pad = np.array([[1, 2]], np.int32)
    srv = TTSServer.for_pipeline(pipe, pad, sample_rate=22050,
                                 max_batch=4, max_wait_ms=200.0,
                                 batch_sizes=(1, 2, 4))
    try:
        # warm the 1-wide bucket, then submit three concurrently
        srv.synthesize(reqs[0])
        futs = [srv.submit(r) for r in reqs]
        outs = [f.result(timeout=600) for f in futs]
    finally:
        srv.close()
    # each served stream equals the pipeline's own batched output
    direct, _ = pipe.synthesize_ids_batch(list(reqs))
    for o, d in zip(outs, direct):
        np.testing.assert_array_equal(o, d)


def test_http_streaming_endpoint():
    """Chunked audio/L16 streaming with TTFA measurement (generator-level
    contract — the Qwen pipeline plugs in via stream_fn)."""
    def stream_fn(request):
        for i in range(3):
            time.sleep(0.01)
            yield np.full((160,), i + 1, np.int16)

    srv = TTSServer(_echo_batch, sample_rate=24000, batch_sizes=(1,),
                    max_batch=1, stream_fn=stream_fn)
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        body = json.dumps({"ids": [[1, 2]]}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/stream", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=30) as r:
            assert r.headers["Content-Type"].startswith("audio/L16")
            assert float(r.headers["X-TTFA-MS"]) >= 10.0
            pcm = np.frombuffer(r.read(), np.int16)
        assert pcm.shape == (480,)
        assert list(np.unique(pcm)) == [1, 2, 3]
        assert srv.stats()["mean_ttfa_ms"] >= 10.0
    finally:
        httpd.shutdown()
        srv.close()


def test_http_streaming_real_qwen_pipeline():
    """End-to-end: the tiny Qwen pipeline's synthesize_streaming generator
    through the chunked HTTP endpoint — streamed PCM must equal the
    concatenated generator chunks (greedy decode is deterministic)."""
    import jax

    from tests.test_qwen import TINY, TINY_CODEC
    from tts_tpu.models.qwen_codec import init_decoder_params
    from tts_tpu.models.qwen_tts import (init_predictor_params,
                                         init_talker_params)
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    params = {**init_talker_params(TINY, jax.random.key(0)),
              **init_predictor_params(TINY, jax.random.key(1))}
    cparams = init_decoder_params(TINY_CODEC, jax.random.key(2))
    pipe = QwenTTSPipeline(params, TINY, cparams, TINY_CODEC,
                           QwenDecodeConfig(max_frames=8))
    ids = np.array([[5, 9, 13, 2]], np.int32)
    prefill, trailing = pipe.build_prefill_embeds(ids, language_id=3)
    ref = np.concatenate(list(pipe.synthesize_streaming(
        prefill, trailing, chunk_frames=3, window=4, left_context=2)))

    def stream_fn(request):
        p, t = request
        return pipe.synthesize_streaming(p, t, chunk_frames=3, window=4,
                                         left_context=2)

    srv = TTSServer(_echo_batch, sample_rate=24000, batch_sizes=(1,),
                    max_batch=1, stream_fn=stream_fn,
                    request_from_json=lambda body: (prefill, trailing))
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/stream", data=b"{}",
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            ttfa = float(r.headers["X-TTFA-MS"])
            pcm = np.frombuffer(r.read(), np.int16)
        np.testing.assert_array_equal(pcm, ref)
        assert ttfa > 0
    finally:
        httpd.shutdown()
        srv.close()


def test_http_round_trip(kani_pipe):
    pipe, _ = kani_pipe
    pad = np.array([[1, 2]], np.int32)
    srv = TTSServer.for_pipeline(pipe, pad, sample_rate=22050,
                                 max_batch=2, max_wait_ms=5.0,
                                 batch_sizes=(1, 2))
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        body = json.dumps({"ids": [[3, 9, 5]]}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/synthesize", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            wav_bytes = r.read()
        assert wav_bytes[:4] == b"RIFF"
        direct, _ = pipe.synthesize_ids_batch(
            [np.array([[3, 9, 5]], np.int32)])
        import io
        import wave

        with wave.open(io.BytesIO(wav_bytes)) as f:
            assert f.getframerate() == 22050
            got = np.frombuffer(f.readframes(f.getnframes()), np.int16)
        np.testing.assert_array_equal(got, direct[0])

        with urllib.request.urlopen(
                f"http://{host}:{port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1
    finally:
        httpd.shutdown()
        srv.close()


def test_http_streaming_is_http11():
    """Chunked transfer-encoding requires HTTP/1.1: an HTTP/1.0 status
    line makes conforming clients ignore chunk framing and deliver the
    hex size lines as audio bytes."""
    def stream_fn(request):
        yield np.full((16,), 7, np.int16)

    srv = TTSServer(_echo_batch, sample_rate=24000, batch_sizes=(1,),
                    max_batch=1, stream_fn=stream_fn)
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        import http.client

        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("POST", "/stream",
                     body=json.dumps({"ids": [[1]]}).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.version == 11, "response must be HTTP/1.1 for chunked"
        assert resp.headers["Transfer-Encoding"] == "chunked"
        pcm = np.frombuffer(resp.read(), np.int16)
        np.testing.assert_array_equal(pcm, np.full((16,), 7, np.int16))
        conn.close()
    finally:
        httpd.shutdown()
        srv.close()


def test_http_stream_error_midway_truncates_not_injects():
    """A generator failure after audio has been sent must surface as a
    truncated chunked stream (protocol error at the client), never as a
    500 status line spliced into the PCM bytes."""
    def stream_fn(request):
        yield np.full((16,), 3, np.int16)
        raise RuntimeError("device fell over")

    srv = TTSServer(_echo_batch, sample_rate=24000, batch_sizes=(1,),
                    max_batch=1, stream_fn=stream_fn)
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        import http.client

        conn = http.client.HTTPConnection(host, port, timeout=30)
        conn.request("POST", "/stream",
                     body=json.dumps({"ids": [[1]]}).encode(),
                     headers={"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200          # headers were already committed
        with pytest.raises(http.client.HTTPException):
            resp.read()                     # truncated chunk stream
        conn.close()
    finally:
        httpd.shutdown()
        srv.close()


def test_stats_do_not_grow_memory_per_batch():
    """occupancy/ttfa are running sums, not unbounded lists."""
    srv = TTSServer(_echo_batch, sample_rate=24000, batch_sizes=(1,),
                    max_batch=1)
    try:
        for _ in range(5):
            srv.synthesize(np.array([1]))
        for _ in range(4):
            srv.record_ttfa(10.0)
        s = srv.stats()
        assert s["batches"] == 5 and s["mean_occupancy"] == 1.0
        assert s["streams"] == 4 and s["mean_ttfa_ms"] == 10.0
        assert not any(isinstance(v, list)
                       for v in vars(srv.batcher.stats).values())
    finally:
        srv.close()


def test_cli_ladder_includes_max_batch():
    """--max-batch values off the power-of-two ladder must still build a
    valid MicroBatcher (regression: --max-batch 6 crashed at startup)."""
    for mb in (1, 2, 3, 5, 6, 7, 8):
        sizes = tuple(sorted({s for s in (1, 2, 4, 8) if s < mb} | {mb}))
        b = MicroBatcher(_echo_batch, max_batch=mb, batch_sizes=sizes,
                         pad_request=0)
        assert b.submit(21).result(timeout=10) == 42
        b.close()
