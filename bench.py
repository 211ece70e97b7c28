#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line.

Primary metric (BASELINE.json north star): F5-TTS NFE=32 end-to-end RTF on
one chip — full pipeline (mel extract -> 31 Euler steps over the 22-block
DiT with batch-2 CFG -> Vocos decode) at the reference README test size
(~6 s reference audio, ~15 words, README.md:26-30). Reference baselines:
RTF 60 (i7 CPU) / RTF 21 (MX150 GPU); target RTF <= 0.05.

vs_baseline = baseline_RTF(MX150) / our_RTF  (higher = faster than ref).
"""
import json
import sys

import jax
import jax.numpy as jnp


def bench_f5():
    from tts_tpu.models.f5 import F5Config, init_params
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    on_tpu = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = F5Config()
    vcfg = VocosConfig()
    # jit the inits: one dispatch instead of one per tensor (slow over the
    # remote-TPU tunnel)
    f5p = jax.jit(lambda k: init_params(cfg, k, dtype))(jax.random.key(0))
    vp = jax.jit(lambda k: vocos_init(vcfg, k, dtype))(jax.random.key(1))
    pipe = F5Pipeline(f5p, cfg, {" ": 0}, vp, vcfg)
    stats = pipe.benchmark(ref_seconds=6.0, gen_words=15,
                           iters=8 if on_tpu else 1)
    baseline_rtf = 21.0  # MX150 GPU, README.md:30
    # primary = sustained per-chip RTF: identical jobs queued back-to-back
    # with one fetch fence (exact output, FORA off) — the per-chip serving
    # metric; single-request latency RTF is also reported.
    rtf = stats.get("sustained_rtf", stats["rtf"])
    return {
        "metric": "f5_tts_nfe32 end-to-end RTF/chip, sustained "
                  "(6s ref, 15 words; exact path)",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(baseline_rtf / max(rtf, 1e-9), 1),
        "latency_rtf": round(stats["rtf"], 4),
    }


def bench_qwen_secondary():
    """Secondary driver-verified metric: Qwen3-TTS-0.6B two-level decode
    (talker + 15-group predictor + 12 Hz codec) frames/s -> RTF at the
    reference table row (/root/reference/README.md:37, Q8F32 RTF 3.1 on
    i3-12300). int8 weight-only — the reference row is Q8."""
    import time

    import numpy as np

    from tts_tpu.models.qwen_codec import (QwenCodecDecoderConfig,
                                           init_decoder_params)
    from tts_tpu.models.qwen_tts import (QwenTTSConfig,
                                         init_predictor_params,
                                         init_talker_params)
    from tts_tpu.runtime.qwen import QwenDecodeConfig, QwenTTSPipeline

    on_tpu = jax.devices()[0].platform == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    cfg = QwenTTSConfig()
    ccfg = QwenCodecDecoderConfig()
    params = {
        **jax.jit(lambda k: init_talker_params(cfg, k, dt))(jax.random.key(0)),
        **jax.jit(lambda k: init_predictor_params(cfg, k, dt))(
            jax.random.key(1)),
    }
    cparams = jax.jit(lambda k: init_decoder_params(ccfg, k, dt))(
        jax.random.key(2))
    pipe = QwenTTSPipeline(params, cfg, cparams, ccfg,
                           QwenDecodeConfig(max_frames=120),
                           quantize=8 if on_tpu else None)
    ids = np.arange(5, 37, dtype=np.int32)[None]
    pipe.synthesize_ids(ids, language_id=3)        # compile
    t0 = time.perf_counter()
    _wav, stats = pipe.synthesize_ids(ids, language_id=3)
    wall = time.perf_counter() - t0
    fps = stats["frames"] / wall
    rtf = wall / (stats["frames"] / 12.0)          # 12 Hz codec
    return {
        "secondary_metric": "qwen3_tts_0.6b int8 two-level decode",
        "secondary_value": round(fps, 1),
        "secondary_unit": "frames/s",
        "secondary_rtf": round(rtf, 4),
        "secondary_vs_baseline": round(3.1 / max(rtf, 1e-9), 1),
    }


def _wait_for_backend(max_wait_s: float = 900.0) -> None:
    """Bounded wait for the TPU backend. The axon tunnel can wedge for tens
    of minutes after a client dies mid-compile (observed in round 2);
    jax.devices() then HANGS rather than raising, so probe it in a killable
    subprocess and only init in-process once a probe succeeds."""
    import subprocess
    import sys
    import time

    deadline = time.time() + max_wait_s
    while True:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=120, capture_output=True)
            if proc.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("warning: TPU backend probe failed for "
                  f"{max_wait_s:.0f}s; proceeding anyway", file=sys.stderr)
            return
        time.sleep(30)


if __name__ == "__main__":
    _wait_for_backend()
    result = bench_f5()
    try:
        result.update(bench_qwen_secondary())
    except Exception as e:  # the secondary metric must not sink the primary
        result["secondary_error"] = repr(e)[:200]
    print(json.dumps(result))
