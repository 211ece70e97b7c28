"""Family-generic continuous serving front (serving/families.py).

`continuous_server(family, pipe)` must wire each family's JSON request
schema, submit adapter, and /stream route so the served output equals the
solo pipeline output — the same guarantee each slot server's own tests
prove, here checked through the HTTP-facing TTSServer layer.
"""
import json
import urllib.request

import jax
import numpy as np
import pytest

from tts_tpu.serving import serve_http
from tts_tpu.serving.families import continuous_server, default_request_body


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=600)


def test_qwen_family_server_http_round_trip():
    from test_continuous_qwen import _pipeline

    pipe = _pipeline()
    ids = np.array([[5, 9, 13, 2]], np.int32)
    wav_solo, _ = pipe.synthesize_ids(ids, language_id=3)

    srv = continuous_server("qwen", pipe, slots=2, chunk=4,
                            prompt_bucket=32, max_seq_len=128,
                            stream_kw={"window": 6, "left_context": 2})
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        body = {"ids": ids.tolist(), "language_id": 3}
        with _post(f"http://{host}:{port}/synthesize", body) as r:
            data = r.read()
        # RIFF header (44 bytes) + int16 samples
        pcm = np.frombuffer(data[44:], np.int16)
        np.testing.assert_array_equal(pcm, wav_solo)
        # /stream rides the slot batch with the overridden window
        with _post(f"http://{host}:{port}/stream", body) as r:
            spcm = np.frombuffer(r.read(), np.int16)
        assert len(spcm) > 0
    finally:
        httpd.shutdown()
        srv.close()


def test_voxcpm_family_server_matches_solo():
    from test_continuous_voxcpm import _pipeline

    pipe = _pipeline()
    p = np.array([[5, 9]], np.int32)
    t = np.array([[11, 3, 7]], np.int32)
    wav_solo, st = pipe.synthesize_ids(p, t, seed=pipe.dcfg.seed)

    srv = continuous_server("voxcpm", pipe, slots=2, chunk=2,
                            prompt_bucket=16, max_seq_len=128)
    httpd = serve_http(srv)
    host, port = httpd.server_address
    try:
        body = {"ids": t.tolist(), "prompt_ids": p.tolist()}
        with _post(f"http://{host}:{port}/synthesize", body) as r:
            pcm = np.frombuffer(r.read()[44:], np.int16)
        np.testing.assert_array_equal(pcm, wav_solo)
    finally:
        httpd.shutdown()
        srv.close()


def test_indextts_family_server_matches_solo():
    from test_continuous_indextts import _pipeline

    pipe = _pipeline()
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2000) * 3000).astype(np.int16)
    ref = pipe.encode_reference(audio)
    ids = np.array([[4, 9, 2]], np.int32)
    wav_solo, _ = pipe.synthesize_ids(ids, ref, max_gen=6)

    srv = continuous_server("indextts", pipe, ref=ref, slots=2, chunk=4,
                            text_bucket=16, max_tokens=6, max_seq_len=512)
    try:
        wav = srv.synthesize(np.asarray(ids, np.int32))
        np.testing.assert_array_equal(wav, wav_solo)
    finally:
        srv.close()


def test_f5_family_server_matches_solo():
    from test_continuous_f5 import _pipeline

    pipe = _pipeline()
    rng = np.random.default_rng(1)
    ref_audio = (rng.standard_normal(2000) * 0.05).astype(np.float32)
    wav_solo, _ = pipe.synthesize(ref_audio, "abc ab", "ba cab")

    # frames=128 == the bucket _prepare picks (TINY.max_signal_len clamps)
    srv = continuous_server("f5", pipe, slots=2, chunk_steps=2,
                            frames=128, audio_bucket=32768, text_bucket=64,
                            ref_audio=ref_audio, ref_text="abc ab")
    try:
        req = srv.request_from_json({"gen_text": "ba cab"})
        wav, _n = srv.submit(req).result(timeout=600)
        # server and solo are separately-jitted programs; XLA fusion
        # differences can flip an int16 sample sitting exactly on a
        # rounding boundary — allow 1 LSB
        np.testing.assert_allclose(wav.astype(np.int32),
                                   wav_solo.astype(np.int32), atol=1)
    finally:
        srv.close()


def test_f5_needs_ref():
    with pytest.raises(ValueError, match="ref_audio"):
        continuous_server("f5", object())


def test_unknown_family():
    with pytest.raises(ValueError, match="unknown family"):
        continuous_server("nope", object())


def test_default_request_bodies():
    assert "ids" in default_request_body("kani")
    assert "gen_text" in default_request_body("f5")


def test_router_over_multiple_pipelines():
    """A list of pipelines builds one slot server per pipeline behind a
    least-loaded SlotRouter; outputs still equal solo and stats
    aggregate across servers through the TTSServer layer."""
    from test_continuous_qwen import _pipeline

    pipes = [_pipeline(), _pipeline()]
    ids = np.array([[5, 9, 13, 2]], np.int32)
    wav_solo, _ = pipes[0].synthesize_ids(ids, language_id=3)

    srv = continuous_server("qwen", pipes, slots=2, chunk=4,
                            prompt_bucket=32, max_seq_len=128)
    try:
        req = srv.request_from_json({"ids": ids.tolist(), "language_id": 3})
        futs = [srv.submit(req) for _ in range(3)]
        outs = [f.result(timeout=600) for f in futs]
        for wav, _n in outs:
            np.testing.assert_array_equal(wav, wav_solo)
        import time

        deadline = time.time() + 30
        while srv.stats()["completed"] < 3 and time.time() < deadline:
            time.sleep(0.01)   # completed increments just after set_result
        st = srv.stats()
        assert st["servers"] == 2
        assert st["completed"] == 3
        # least-loaded routing spread work across both servers
        assert all(p["requests"] >= 1 for p in st["per_server"])
    finally:
        srv.close()
