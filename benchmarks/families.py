#!/usr/bin/env python
"""Per-family TPU benchmarks at reference-comparable sizes.

Reproduces the measurement conditions behind the README/COVERAGE
performance tables (the reference's own table lives at
/root/reference/README.md:26-39; common test = ~6 s reference audio,
~15 words generated). Weights are random (no checkpoints in this env) —
wall-clock is architecture+shape-determined, so RTF/token-rate numbers are
valid; audio content is not.

Run from the repo root on the TPU: `python benchmarks/families.py [family]`.
Prints one JSON line per family.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _dt():
    return jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32


def bench_f5():
    import bench

    return bench.bench_f5()


def bench_bigvgan():
    from tts_tpu.runtime.vocoder import BigVGANVocoder

    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bv_init

    cfg = BigVGANConfig()
    params = jax.jit(lambda k: bv_init(cfg, k, _dt()))(jax.random.key(0))
    voc = BigVGANVocoder(params, cfg, dtype=_dt())
    stats = voc.benchmark(mel_frames=512, iters=50)
    sps = stats["samples_per_sec"]
    base = 512 * 256 / 4.6        # reference: mel (1,100,512) in 4.6 s (MX150)
    return {"metric": "bigvgan_v2_24k mel(1,100,512)",
            "value": round(sps, 0), "unit": "samples/s",
            "vs_baseline": round(sps / base, 1)}


def bench_kani(quantize=None):
    from tts_tpu.models.kani import KaniConfig, init_params
    from tts_tpu.models.nanocodec import NanoCodecConfig
    from tts_tpu.models.nanocodec import init_params as nc_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    cfg = KaniConfig()
    ncfg = NanoCodecConfig()
    kp = jax.jit(lambda k: init_params(cfg, k, _dt()))(jax.random.key(0))
    cp = jax.jit(lambda k: nc_init(ncfg, k, _dt()))(jax.random.key(1))
    pipe = KaniPipeline(kp, cfg, cp, ncfg,
                        KaniDecodeConfig(max_new_tokens=400),
                        quantize=quantize)
    ids = np.arange(1, 33, dtype=np.int32)[None]
    pipe.synthesize_ids(ids)                       # compile
    t0 = time.perf_counter()
    wav, stats = pipe.synthesize_ids(ids)
    tok_s = stats["tokens"] / (time.perf_counter() - t0)
    return {"metric": f"kani_370m decode{f' int{quantize}' if quantize else ''}",
            "value": round(tok_s, 0), "unit": "tok/s",
            "vs_baseline": None}


def bench_kani_batch(bsz: int = 8, quantize=None):
    """Multi-request AR serving: aggregate tok/s decoding B streams in one
    while_loop. AR decode at B=1 is latency-bound, so this is where TPU
    batching multiplies throughput."""
    from tts_tpu.models.kani import KaniConfig, init_params
    from tts_tpu.models.nanocodec import NanoCodecConfig
    from tts_tpu.models.nanocodec import init_params as nc_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    cfg = KaniConfig()
    ncfg = NanoCodecConfig()
    kp = jax.jit(lambda k: init_params(cfg, k, _dt()))(jax.random.key(0))
    cp = jax.jit(lambda k: nc_init(ncfg, k, _dt()))(jax.random.key(1))
    pipe = KaniPipeline(kp, cfg, cp, ncfg,
                        KaniDecodeConfig(max_new_tokens=400),
                        quantize=quantize)
    reqs = [np.arange(1, 17 + 2 * b, dtype=np.int32)[None]
            for b in range(bsz)]
    pipe.synthesize_ids_batch(reqs)                # compile
    t0 = time.perf_counter()
    wavs, stats = pipe.synthesize_ids_batch(reqs)
    tok_s = stats["tokens"] / (time.perf_counter() - t0)
    return {"metric": f"kani_370m batched serving B={bsz}",
            "value": round(tok_s, 0), "unit": "tok/s aggregate",
            "vs_baseline": None}


def bench_indextts(quantize=None):
    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bigvgan_init
    from tts_tpu.models.indextts import (IndexTTSConfig, init_conformer_params,
                                         init_ecapa_params, init_gpt_params,
                                         init_perceiver_params)
    from tts_tpu.runtime.indextts import IndexTTSPipeline

    cfg = IndexTTSConfig()
    vcfg = BigVGANConfig(num_mels=cfg.gpt_dim, upsample_initial_channel=512,
                         use_tanh_at_final=True, use_bias_at_final=True)
    dt = _dt()
    ks = jax.random.split(jax.random.key(0), 8)
    c0 = vcfg.upsample_initial_channel

    @jax.jit
    def build(ks):
        return {
            "conformer": init_conformer_params(cfg, ks[0], dtype=dt),
            "perceiver": init_perceiver_params(cfg, ks[1], dt),
            "ecapa": init_ecapa_params(cfg, ks[2], dt),
            "gpt": init_gpt_params(cfg, ks[3], dt),
            "bigvgan": bigvgan_init(vcfg, ks[4], dt),
            "cond_layer": {
                "w": jax.random.normal(ks[5], (cfg.speaker_embed_dim, c0), dt) * 0.02,
                "b": jnp.zeros((c0,), dt)},
            "conds": [
                {"w": jax.random.normal(ks[6], (cfg.speaker_embed_dim, c), dt) * 0.02,
                 "b": jnp.zeros((c,), dt)}
                for c in vcfg.stage_channels],
        }

    params = build(ks)
    pipe = IndexTTSPipeline(params, cfg, vcfg, quantize=quantize)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(6 * 24000) * 3000).astype(np.int16)
    ref = pipe.encode_reference(audio)
    ids = np.arange(5, 37, dtype=np.int32)[None]
    pipe.synthesize_ids(ids, ref, max_gen=200)     # compile
    t0 = time.perf_counter()
    wav, stats = pipe.synthesize_ids(ids, ref, max_gen=200)
    tok_s = stats.tokens / (time.perf_counter() - t0)
    return {"metric": f"indextts_1.5 decode{f' int{quantize}' if quantize else ''}",
            "value": round(tok_s, 0), "unit": "tok/s",
            "vs_baseline": None}


def bench_indextts_batch(bsz: int = 8):
    """Multi-request IndexTTS AR serving: aggregate tok/s for B streams."""
    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bigvgan_init
    from tts_tpu.models.indextts import (IndexTTSConfig, init_conformer_params,
                                         init_ecapa_params, init_gpt_params,
                                         init_perceiver_params)
    from tts_tpu.runtime.indextts import IndexTTSPipeline

    cfg = IndexTTSConfig()
    vcfg = BigVGANConfig(num_mels=cfg.gpt_dim, upsample_initial_channel=512,
                         use_tanh_at_final=True, use_bias_at_final=True)
    dt = _dt()
    ks = jax.random.split(jax.random.key(0), 8)
    c0 = vcfg.upsample_initial_channel

    @jax.jit
    def build(ks):
        return {
            "conformer": init_conformer_params(cfg, ks[0], dtype=dt),
            "perceiver": init_perceiver_params(cfg, ks[1], dt),
            "ecapa": init_ecapa_params(cfg, ks[2], dt),
            "gpt": init_gpt_params(cfg, ks[3], dt),
            "bigvgan": bigvgan_init(vcfg, ks[4], dt),
            "cond_layer": {
                "w": jax.random.normal(ks[5], (cfg.speaker_embed_dim, c0), dt) * 0.02,
                "b": jnp.zeros((c0,), dt)},
            "conds": [
                {"w": jax.random.normal(ks[6], (cfg.speaker_embed_dim, c), dt) * 0.02,
                 "b": jnp.zeros((c,), dt)}
                for c in vcfg.stage_channels],
        }

    params = build(ks)
    pipe = IndexTTSPipeline(params, cfg, vcfg)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(6 * 24000) * 3000).astype(np.int16)
    ref = pipe.encode_reference(audio)
    reqs = [(np.arange(5, 29 + 2 * b, dtype=np.int32)[None], ref)
            for b in range(bsz)]
    pipe.synthesize_ids_batch(reqs, max_gen=200)       # compile
    t0 = time.perf_counter()
    wavs, stats = pipe.synthesize_ids_batch(reqs, max_gen=200)
    tok_s = stats["tokens"] / (time.perf_counter() - t0)
    return {"metric": f"indextts_1.5 batched serving B={bsz}",
            "value": round(tok_s, 0), "unit": "tok/s aggregate",
            "vs_baseline": None}


def bench_qwen(quantize=None):
    from tts_tpu.models.qwen_codec import (QwenCodecDecoderConfig,
                                           init_decoder_params)
    from tts_tpu.models.qwen_tts import (QwenTTSConfig, init_predictor_params,
                                         init_talker_params)
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    cfg = QwenTTSConfig()
    ccfg = QwenCodecDecoderConfig()
    dt = _dt()
    params = {
        **jax.jit(lambda k: init_talker_params(cfg, k, dt))(jax.random.key(0)),
        **jax.jit(lambda k: init_predictor_params(cfg, k, dt))(jax.random.key(1)),
    }
    cparams = jax.jit(lambda k: init_decoder_params(ccfg, k, dt))(jax.random.key(2))
    pipe = QwenTTSPipeline(params, cfg, cparams, ccfg,
                           QwenDecodeConfig(max_frames=120),
                           quantize=quantize)
    ids = np.arange(5, 37, dtype=np.int32)[None]
    pipe.synthesize_ids(ids, language_id=3)        # compile
    t0 = time.perf_counter()
    wav, stats = pipe.synthesize_ids(ids, language_id=3)
    wall = time.perf_counter() - t0
    fps = stats["frames"] / wall
    rtf = wall / (stats["frames"] / 12.0)          # 12 Hz codec
    return {"metric": f"qwen3_tts_0.6b decode{f' int{quantize}' if quantize else ''}",
            "value": round(fps, 1), "unit": "frames/s",
            "rtf": round(rtf, 4), "vs_baseline": round(3.1 / rtf, 1)}


def bench_qwen_batch(bsz: int = 8):
    """Multi-request Qwen serving: aggregate frames/s for B streams through
    the fused talker+predictor loop."""
    from tts_tpu.models.qwen_codec import (QwenCodecDecoderConfig,
                                           init_decoder_params)
    from tts_tpu.models.qwen_tts import (QwenTTSConfig, init_predictor_params,
                                         init_talker_params)
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    cfg = QwenTTSConfig()
    ccfg = QwenCodecDecoderConfig()
    dt = _dt()
    params = {
        **jax.jit(lambda k: init_talker_params(cfg, k, dt))(jax.random.key(0)),
        **jax.jit(lambda k: init_predictor_params(cfg, k, dt))(jax.random.key(1)),
    }
    cparams = jax.jit(lambda k: init_decoder_params(ccfg, k, dt))(jax.random.key(2))
    pipe = QwenTTSPipeline(params, cfg, cparams, ccfg,
                           QwenDecodeConfig(max_frames=120))
    reqs = []
    for b in range(bsz):
        ids = np.arange(5, 29 + 2 * b, dtype=np.int32)[None]
        reqs.append(pipe.build_prefill_embeds(ids, language_id=3))
    pipe.synthesize_from_prefill_batch(reqs)       # compile
    t0 = time.perf_counter()
    wavs, stats = pipe.synthesize_from_prefill_batch(reqs)
    wall = time.perf_counter() - t0
    fps = stats["frames"] / wall
    return {"metric": f"qwen3_tts_0.6b batched serving B={bsz}",
            "value": round(fps, 1), "unit": "frames/s aggregate",
            "vs_baseline": None}


def _bench_voxcpm(v2: bool, quantize=None):
    from tts_tpu.models.voxcpm import (VoxCPMConfig, init_params,
                                       init_vae_params, voxcpm_v2_config)
    from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

    cfg = voxcpm_v2_config() if v2 else VoxCPMConfig()
    dt = _dt()
    params = jax.jit(lambda k: init_params(cfg, k, dt))(jax.random.key(0))
    vae = jax.jit(lambda k: init_vae_params(cfg.vae, k, dt))(jax.random.key(1))
    # min_latents forces sustained generation: with random weights the stop
    # head can fire after ~3 latents, which would measure fixed costs, not
    # the sustained RTF the reference table reports
    pipe = VoxCPMPipeline(params, cfg, vae,
                          VoxCPMDecodeConfig(max_latents=48, min_latents=48),
                          quantize=quantize)
    prompt = np.arange(5, 21, dtype=np.int32)[None]
    target = np.arange(21, 53, dtype=np.int32)[None]
    pipe.synthesize_ids(prompt, target)            # compile
    t0 = time.perf_counter()
    wav, stats = pipe.synthesize_ids(prompt, target)
    wall = time.perf_counter() - t0
    audio_s = len(wav) / pipe.output_sample_rate
    rtf = wall / max(audio_s, 1e-9)
    name = "voxcpm_2" if v2 else "voxcpm_1.5"
    base = 0.34 if v2 else 0.17                    # reference GPU RTFs
    return {"metric": f"{name} end-to-end{f' int{quantize}' if quantize else ''}",
            "value": round(rtf, 4), "unit": "rtf",
            "vs_baseline": round(base / rtf, 1)}


def bench_voxcpm_batch(bsz: int = 8):
    """Multi-request VoxCPM-1.5 serving: per-chip RTF over B concurrent
    streams (dual-LM + CFM steps batched)."""
    from tts_tpu.models.voxcpm import (VoxCPMConfig, init_params,
                                       init_vae_params)
    from tts_tpu.runtime.voxcpm import VoxCPMDecodeConfig, VoxCPMPipeline

    cfg = VoxCPMConfig()
    dt = _dt()
    params = jax.jit(lambda k: init_params(cfg, k, dt))(jax.random.key(0))
    vae = jax.jit(lambda k: init_vae_params(cfg.vae, k, dt))(jax.random.key(1))
    pipe = VoxCPMPipeline(params, cfg, vae,
                          VoxCPMDecodeConfig(max_latents=48, min_latents=48))
    reqs = [(np.arange(5, 21, dtype=np.int32)[None],
             np.arange(21, 53 + 2 * b, dtype=np.int32)[None])
            for b in range(bsz)]
    pipe.synthesize_ids_batch(reqs)                # compile
    t0 = time.perf_counter()
    wavs, stats = pipe.synthesize_ids_batch(reqs)
    wall = time.perf_counter() - t0
    rtf = wall / stats["audio_s"]
    return {"metric": f"voxcpm_1.5 batched serving B={bsz}",
            "value": round(rtf, 4), "unit": "rtf/chip",
            "vs_baseline": round(0.17 / rtf, 1)}


def bench_voxcpm15(quantize=None):
    return _bench_voxcpm(False, quantize)


def bench_voxcpm2(quantize=None):
    return _bench_voxcpm(True, quantize)


def bench_f5_batch(bsz: int = 4):
    """Batched serving throughput: B copies of the reference test request
    in one program. value = per-chip RTF (wall / total generated audio) —
    lower is more throughput; compare with the B=1 latency RTF."""
    from tts_tpu.models.f5 import F5Config, init_params
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    cfg = F5Config()
    vcfg = VocosConfig()
    dt = _dt()
    f5p = jax.jit(lambda k: init_params(cfg, k, dt))(jax.random.key(0))
    vp = jax.jit(lambda k: vocos_init(vcfg, k, dt))(jax.random.key(1))
    pipe = F5Pipeline(f5p, cfg, {" ": 0}, vp, vcfg)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(6 * cfg.sample_rate) * 3000).astype(np.int16)
    req = (audio, "Some call me nature, others call me mother nature.",
           " ".join(["word"] * 15))
    reqs = [req] * bsz
    pipe.synthesize_batch(reqs)                    # compile
    t0 = time.perf_counter()
    outs, stats = pipe.synthesize_batch(reqs)
    wall = time.perf_counter() - t0
    rtf = wall / stats.audio_s
    return {"metric": f"f5_tts_nfe32 batched serving B={bsz}",
            "value": round(rtf, 4), "unit": "rtf/chip",
            "vs_baseline": round(21.0 / rtf, 1)}


ALL = {
    "f5": bench_f5,
    "f5_batch": bench_f5_batch,
    "kani_batch": bench_kani_batch,
    "indextts_batch": bench_indextts_batch,
    "qwen_batch": bench_qwen_batch,
    "voxcpm_batch": bench_voxcpm_batch,
    "bigvgan": bench_bigvgan,
    "kani": bench_kani,
    "indextts": bench_indextts,
    "qwen": bench_qwen,
    "voxcpm15": bench_voxcpm15,
    "voxcpm2": bench_voxcpm2,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    for n in names:
        try:
            print(json.dumps(ALL[n]()))
        except Exception as e:  # keep going; a family failure is data too
            print(json.dumps({"metric": n, "error": str(e)[:200]}))
