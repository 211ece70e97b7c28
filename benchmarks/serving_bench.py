#!/usr/bin/env python
"""Admission batching (MicroBatcher) vs continuous batching (KaniSlotServer)
under the same Poisson-ish request stream: per-request latency p50/p99.

Run on the TPU from the repo root: `python benchmarks/serving_bench.py
[rate_rps] [n_requests]`. Prints one JSON line per server mode.

The workload mirrors reference-scale Kani requests (~0.6B config is too
slow to iterate under a CPU fallback; the default here uses the full
KaniConfig when a TPU is present, a tiny config otherwise so the harness
stays runnable anywhere).
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def build_pipeline(on_tpu: bool):
    import jax.numpy as jnp

    from tts_tpu.models.kani import KaniConfig, init_params
    from tts_tpu.models.nanocodec import NanoCodecConfig
    from tts_tpu.models.nanocodec import init_params as codec_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    if on_tpu:
        # kani-tts-370m shape; max_seq_len raised so the slot server fits
        # several generations between drains
        cfg = KaniConfig(max_seq_len=4096, stop_token=-1)
        gen = 256
    else:
        cfg = KaniConfig(hidden_size=32, num_heads=2, num_kv_heads=1,
                         head_dim=16, ffn_dim=64, vocab_size=128,
                         layer_types=("conv", "attn"), max_seq_len=1024,
                         stop_token=-1)
        gen = 48
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    params = jax.jit(lambda k: init_params(cfg, k, dt))(jax.random.key(0))
    ccfg = NanoCodecConfig() if on_tpu else NanoCodecConfig(
        base_channels=16, up_sample_rates=(2, 2), kernel_sizes=(3,),
        dilations=(1, 3), activation="half_snake")
    cparams = jax.jit(lambda k: codec_init(ccfg, k, dt))(jax.random.key(1))
    pipe = KaniPipeline(params, cfg, cparams, ccfg,
                        KaniDecodeConfig(max_new_tokens=gen,
                                         repeat_penalty=1.0),
                        quantize=8 if on_tpu else None)
    return pipe, gen


def drive(submit, n_requests: int, rate_rps: float, gen: int, seed=0):
    """Submit n requests at exponential inter-arrival gaps; returns
    sorted per-request latencies (submit -> result)."""
    rng = np.random.default_rng(seed)
    futs = []
    for i in range(n_requests):
        ids = np.array([[3 + (i % 50), 9, 4 + (i % 7)]], np.int32)
        t0 = time.perf_counter()
        futs.append((submit(ids), t0))
        if i + 1 < n_requests:
            time.sleep(float(rng.exponential(1.0 / rate_rps)))
    lats = []
    for fut, t0 in futs:
        fut.result(timeout=1200)
        lats.append(time.perf_counter() - t0)
    return sorted(lats)


def pct(lats, p):
    return lats[min(int(p * len(lats)), len(lats) - 1)] * 1e3


def build_qwen(on_tpu: bool):
    import jax.numpy as jnp

    from tts_tpu.models.qwen_codec import (QwenCodecDecoderConfig,
                                           init_decoder_params)
    from tts_tpu.models.qwen_tts import (QwenTTSConfig,
                                         init_predictor_params,
                                         init_talker_params)
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    from tts_tpu.models.qwen_tts import Qwen3StackConfig

    dt = jnp.bfloat16 if on_tpu else jnp.float32
    if on_tpu:
        cfg = QwenTTSConfig()                    # 0.6B shapes
        frames = 120                             # 10 s at 12 Hz
        ccfg = QwenCodecDecoderConfig()
    else:                                        # tiny harness config
        cfg = QwenTTSConfig(
            talker=Qwen3StackConfig(hidden_size=32, num_heads=2,
                                    num_kv_heads=1, head_dim=16, ffn_dim=64,
                                    num_layers=2, max_seq_len=1024),
            predictor=Qwen3StackConfig(hidden_size=24, num_heads=2,
                                       num_kv_heads=1, head_dim=12,
                                       ffn_dim=48, num_layers=2,
                                       max_seq_len=32),
            codec_vocab=64, group_vocab=32, num_code_groups=4,
            codec_eos_token_id=-1, codec_bos_id=61, codec_pad_id=60,
            codec_think_id=59, codec_think_bos_id=58, codec_think_eos_id=57,
            tts_bos_token_id=97, tts_eos_token_id=98, tts_pad_token_id=99,
            text_vocab=100, text_hidden=16)
        frames = 12
        ccfg = QwenCodecDecoderConfig(
            num_quantizers=4, codebook_size=32, codebook_dim=16, rvq_dim=8,
            latent_dim=24, decoder_dim=32, upsampling_ratios=(2,),
            upsample_rates=(4, 2), hidden_size=24, num_heads=2,
            num_kv_heads=2, head_dim=12, ffn_dim=48, num_layers=2,
            max_seq_len=64)
    params = {
        **jax.jit(lambda k: init_talker_params(cfg, k, dt))(jax.random.key(0)),
        **jax.jit(lambda k: init_predictor_params(cfg, k, dt))(
            jax.random.key(1)),
    }
    cparams = jax.jit(lambda k: init_decoder_params(ccfg, k, dt))(
        jax.random.key(2))
    pipe = QwenTTSPipeline(params, cfg, cparams, ccfg,
                           QwenDecodeConfig(max_frames=frames),
                           quantize=8 if on_tpu else None)
    return pipe, frames


def qwen_request(i, hidden, rng):
    p = 16 + (i % 5)
    prefill = rng.normal(size=(1, p, hidden)).astype(np.float32) * 0.1
    trailing = rng.normal(size=(1, 12, hidden)).astype(np.float32) * 0.1
    return prefill, trailing


def main_qwen(rate: float, n: int):
    on_tpu = jax.devices()[0].platform == "tpu"
    pipe, frames = build_qwen(on_tpu)
    hidden = pipe.cfg.talker.hidden_size
    rng = np.random.default_rng(0)

    from tts_tpu.serving.continuous_qwen import QwenSlotServer

    srv = QwenSlotServer(pipe, slots=4, chunk=16, prompt_bucket=32,
                         trailing_bucket=16)
    try:
        srv.submit(*qwen_request(0, hidden, rng)).result(timeout=1200)

        # per-request latency under a Poisson stream, continuous batching
        futs = []
        for i in range(n):
            t0 = time.perf_counter()
            futs.append((srv.submit(*qwen_request(i, hidden, rng)), t0))
            if i + 1 < n:
                time.sleep(float(rng.exponential(1.0 / rate)))
        lats = []
        for fut, t0 in futs:
            fut.result(timeout=1200)
            lats.append(time.perf_counter() - t0)
        lats.sort()
        print(json.dumps({
            "metric": f"qwen continuous batching, {rate} rps x {n}, "
                      f"{frames} frames/req",
            "p50_ms": round(pct(lats, 0.5), 1),
            "p99_ms": round(pct(lats, 0.99), 1),
            "stats": srv.stats.snapshot()}))

        # concurrent streaming TTFA: 4 streams sharing the slot batch
        # (window sized to the codec's context; tiny CPU codec has
        # max_seq_len 64 so the reference 72/24 windows only fit on TPU)
        import threading

        win, lctx, cfr = (72, 24, 24) if on_tpu else (8, 2, 4)
        # warm the streaming path (window codec compile) before timing —
        # the solo baseline below is warmed the same way
        for _ in srv.submit_stream(*qwen_request(99, hidden, rng),
                                   window=win, left_context=lctx):
            pass
        ttfa = [None] * 4

        def one_stream(j):
            t0 = time.perf_counter()
            h = srv.submit_stream(*qwen_request(100 + j, hidden, rng),
                                  window=win, left_context=lctx)
            for _ in h:
                if ttfa[j] is None:
                    ttfa[j] = time.perf_counter() - t0

        threads = [threading.Thread(target=one_stream, args=(j,))
                   for j in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        print(json.dumps({
            "metric": "qwen 4 concurrent streams over slots, TTFA",
            "ttfa_ms": [round(t * 1e3, 1) for t in ttfa if t]}))
    finally:
        srv.close()

    # solo-loop streaming baseline: 4 threads each holding its own
    # synthesize_streaming generator (the /stream bypass), contending for
    # dispatch
    import threading

    list(pipe.synthesize_streaming(*qwen_request(0, hidden, rng),
                                   chunk_frames=cfr, window=win,
                                   left_context=lctx))           # compile
    ttfa = [None] * 4

    def solo_stream(j):
        t0 = time.perf_counter()
        for _ in pipe.synthesize_streaming(*qwen_request(200 + j, hidden,
                                                         rng),
                                           chunk_frames=cfr, window=win,
                                           left_context=lctx):
            if ttfa[j] is None:
                ttfa[j] = time.perf_counter() - t0

    threads = [threading.Thread(target=solo_stream, args=(j,))
               for j in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    print(json.dumps({
        "metric": "qwen 4 concurrent solo-loop streams (bypass), TTFA",
        "ttfa_ms": [round(t * 1e3, 1) for t in ttfa if t]}))


def main():
    rate = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if len(sys.argv) > 3 and sys.argv[3] == "qwen":
        main_qwen(rate, n)
        return
    on_tpu = jax.devices()[0].platform == "tpu"
    pipe, gen = build_pipeline(on_tpu)

    # ---- continuous batching
    from tts_tpu.serving.continuous import KaniSlotServer

    srv = KaniSlotServer(pipe, slots=4, chunk=32 if on_tpu else 8,
                         prompt_bucket=16)
    try:
        srv.submit(np.array([[3, 9, 4]], np.int32)).result(timeout=1200)
        lats = drive(lambda ids: srv.submit(ids), n, rate, gen, seed=1)
        print(json.dumps({
            "metric": f"kani continuous batching, {rate} rps x {n}",
            "p50_ms": round(pct(lats, 0.5), 1),
            "p99_ms": round(pct(lats, 0.99), 1),
            "stats": srv.stats.snapshot()}))
    finally:
        srv.close()

    # ---- admission batching baseline
    from tts_tpu.serving.batcher import MicroBatcher

    def batch_fn(reqs):
        wavs, _ = pipe.synthesize_ids_batch(list(reqs))
        return wavs

    mb = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=10.0,
                      batch_sizes=(1, 2, 4),
                      pad_request=np.array([[3]], np.int32))
    try:
        mb.submit(np.array([[3, 9, 4]], np.int32)).result(timeout=1200)
        lats = drive(lambda ids: mb.submit(ids), n, rate, gen, seed=1)
        print(json.dumps({
            "metric": f"kani admission micro-batching, {rate} rps x {n}",
            "p50_ms": round(pct(lats, 0.5), 1),
            "p99_ms": round(pct(lats, 0.99), 1),
            "stats": mb.stats.snapshot()}))
    finally:
        mb.close()


if __name__ == "__main__":
    main()
