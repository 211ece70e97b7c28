"""Multi-device continuous serving: serving/devices.replicate_pipeline
places one pipeline per (virtual CPU) device, continuous_server routes
least-loaded across per-device slot servers, and outputs stay byte-equal
to the solo decode regardless of which device served them.

The conftest forces an 8-device virtual CPU platform, so these tests
exercise the real multi-chip serving path without TPU hardware (the
same mechanism the driver's dryrun uses)."""
import dataclasses as dc

import jax
import numpy as np
import pytest

from test_continuous import _pipeline as _kani_pipeline

from tts_tpu.serving.devices import (
    pipeline_device,
    pipelines_for_devices,
    replicate_pipeline,
)
from tts_tpu.serving.families import continuous_server

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs >=2 devices")


def _device_of(tree):
    leaf = next(l for l in jax.tree_util.tree_leaves(tree)
                if isinstance(l, jax.Array))
    return next(iter(leaf.devices()))


def test_replicate_places_params():
    pipe = _kani_pipeline(max_new_tokens=8)
    devs = jax.devices()[:3]
    clones = pipelines_for_devices(pipe, devs)
    for clone, dev in zip(clones, devs):
        assert pipeline_device(clone) == dev
        assert _device_of(clone.params) == dev
        assert _device_of(clone.codec_params) == dev
        # configs and jit caches are shared, not copied
        assert clone.cfg is pipe.cfg
        assert clone._decode_cache is pipe._decode_cache


def test_replicate_rejects_mesh_pipelines():
    pipe = _kani_pipeline(max_new_tokens=8)
    pipe.mesh = object()   # stand-in for a real Mesh
    with pytest.raises(ValueError, match="mesh"):
        replicate_pipeline(pipe, jax.devices()[0])


def test_kani_router_across_devices():
    """Requests served by per-device replicas byte-equal the solo decode
    and spread across both devices."""
    pipe = _kani_pipeline(max_new_tokens=16)
    ids = np.array([[5, 17, 99, 3]], np.int32)
    wav_solo, stats = pipe.synthesize_ids(ids, max_new_tokens=16)

    pipes = pipelines_for_devices(pipe, jax.devices()[:2])
    srv = continuous_server("kani", pipes, slots=2, chunk=8,
                            prompt_bucket=16)
    try:
        futs = [srv.submit(ids) for _ in range(4)]
        for f in futs:
            wav, n = f.result(timeout=600)
            assert n == stats["tokens"]
            np.testing.assert_array_equal(wav, wav_solo)
        st = srv.stats()
        assert st["servers"] == 2
        assert st["requests"] == 4
        assert all(p["requests"] >= 1 for p in st["per_server"]), \
            "least-loaded routing left a device idle"
    finally:
        srv.close()


def test_indextts_per_device_ref_binding():
    """indextts conditioning is device-bound per server: the families
    wiring device_puts the shared ref onto each replica's device and
    submits route without passing ref."""
    from test_continuous_indextts import _pipeline as _it_pipeline

    pipe = _it_pipeline()
    rng = np.random.default_rng(0)
    ref = pipe.encode_reference(
        (rng.standard_normal(4000) * 3000).astype(np.int16))
    ids = np.array([[7, 3, 11]], np.int32)
    # solo bucket max(16, round16(3)) == server text_bucket 16
    wav_solo, stats = pipe.synthesize_ids(ids, ref, max_gen=8)

    pipes = pipelines_for_devices(pipe, jax.devices()[:2])
    srv = continuous_server("indextts", pipes, slots=2, chunk=4,
                            text_bucket=16, max_tokens=8, ref=ref,
                            max_seq_len=256)
    try:
        outs = [srv.submit(ids).result(timeout=600) for _ in range(2)]
        for wav, n in outs:
            assert n == stats.tokens
            np.testing.assert_array_equal(wav, wav_solo)
        per = srv.stats()["per_server"]
        assert sum(p["requests"] for p in per) == 2
    finally:
        srv.close()
