#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line.

Primary metric (BASELINE.json north star): F5-TTS NFE=32 end-to-end RTF on
one chip — full pipeline (mel extract -> 31 Euler steps over the 22-block
DiT with batch-2 CFG -> Vocos decode) at the reference README test size
(~6 s reference audio, ~15 words, README.md:26-30). Reference baselines:
RTF 60 (i7 CPU) / RTF 21 (MX150 GPU); target RTF <= 0.05.

vs_baseline = baseline_RTF(MX150) / our_RTF  (higher = faster than ref).

Timeout discipline (round-3 postmortem: BENCH_r03 rc=124 lost every
number): the primary metric is computed FIRST and printed/flushed as a
complete JSON line immediately; after every auxiliary section the
cumulative dict is re-printed on a new line, so however late a kill
arrives the captured tail ends in a valid, maximal JSON line. Auxiliary
sections are skipped once a wall-clock deadline passes (recorded under
"skipped"), the persistent XLA compile cache is enabled so a rerun is
warm, and the backend probe fails fast into a parseable JSON error line
instead of proceeding into a wedged backend.
"""
import json
import sys
import time

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
        # latency decomposition: a trivial dispatch+fetch round trip over
        # the same output buffer costs fixed_roundtrip_ms — subtracting it
        # from the latency wall gives compute_rtf, which should match the
        # sustained number if the latency gap is pure transport
        "latency_fixed_ms": round(stats.get("fixed_roundtrip_ms", 0.0), 1),
        "latency_compute_rtf": round(stats.get("compute_rtf", 0.0), 4),
    }


def bench_f5_w8a8_latency():
    """Single-request latency RTF on the opt-in W8A8 path (quantize='w8a8':
    block-fused int8-activation DiT kernels; output delta bounded by
    tests/test_w8a8_bound.py). The exact-path latency gap to 0.05 is pure
    tunnel transport (NOTES.md decomposition); W8A8 buys back ~2 ms/step of
    device time, putting even the transport-burdened single-request number
    under the north-star. Fair comparison: the reference's headline rows
    are themselves Q8 (README.md:33-38)."""
    from tts_tpu.models.f5 import F5Config, init_params
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    if jax.devices()[0].platform != "tpu":
        return {}
    cfg = F5Config()
    vcfg = VocosConfig()
    f5p = jax.jit(lambda k: init_params(cfg, k, jnp.bfloat16))(
        jax.random.key(0))
    vp = jax.jit(lambda k: vocos_init(vcfg, k, jnp.bfloat16))(
        jax.random.key(1))
    pipe = F5Pipeline(f5p, cfg, {" ": 0}, vp, vcfg, quantize="w8a8")
    stats = pipe.benchmark(ref_seconds=6.0, gen_words=15, iters=6)
    return {
        "latency_rtf_w8a8": round(stats["rtf"], 4),
        "sustained_rtf_w8a8": round(stats.get("sustained_rtf",
                                              stats["rtf"]), 4),
    }


def bench_f5_w8a8_step():
    """Driver-verified W8A8 evidence: exact bf16 vs block-fused W8A8 F5
    DiT step time at the bench shape (T=1408, 22 blocks, batch-2 CFG).
    Timing: (t_N2 - t_N1)/(N2 - N1) around jitted lax.scan with a
    device->host fetch fence — the tunnel-safe discipline (NOTES.md).
    Output delta of the W8A8 path is bounded by tests/test_w8a8_bound.py."""
    import time

    from tts_tpu.models.f5 import F5Config, dit_forward, init_params
    from tts_tpu.quant.weight_only import quantize_int8

    if jax.devices()[0].platform != "tpu":
        return {}
    cfg = F5Config()
    t = 1408
    params = jax.jit(lambda k: init_params(cfg, k, jnp.bfloat16))(
        jax.random.key(0))
    noise = jax.random.normal(jax.random.key(1), (1, t, cfg.n_mels),
                              jnp.float32)
    cond = jax.random.normal(jax.random.key(2),
                             (1, t, cfg.n_mels + cfg.text_dim),
                             jnp.bfloat16) * 0.1
    dur = jnp.int32(t - 15)

    def step(params, carry):
        pred, pred1 = dit_forward(
            params, carry.astype(jnp.bfloat16), cond, jnp.zeros_like(cond),
            params["time_table"][0], params["rope_cos"][:t],
            params["rope_sin"][:t], cfg, kv_len=dur, step_idx=0)
        upd = (pred + (pred - pred1) * cfg.cfg_strength).astype(jnp.float32)
        return carry + upd * params["delta_t"][0]

    def time_scan(p, n):
        @jax.jit
        def run(p, s):
            out, _ = jax.lax.scan(lambda c, _: (step(p, c), None), s, None,
                                  length=n)
            return jnp.sum(out.astype(jnp.float32))

        float(run(p, noise))                   # compile + warm (fetch fence)
        t0 = time.perf_counter()
        float(run(p, noise))
        return time.perf_counter() - t0

    def per_iter(p):
        return (time_scan(p, 24) - time_scan(p, 8)) / 16.0 * 1e3

    bf16_ms = per_iter(params)
    qblocks = [
        {**blk,
         "attn": {**blk["attn"], "wqkv": quantize_int8(blk["attn"]["wqkv"]),
                  "wo": quantize_int8(blk["attn"]["wo"])},
         "ff1": {**blk["ff1"], "w": quantize_int8(blk["ff1"]["w"])},
         "ff2": {**blk["ff2"], "w": quantize_int8(blk["ff2"]["w"])}}
        for blk in params["blocks"]]
    w8a8_ms = per_iter({**params, "blocks": qblocks})
    return {
        "f5_bf16_step_ms": round(bf16_ms, 2),
        "f5_w8a8_step_ms": round(w8a8_ms, 2),
        "f5_w8a8_speedup": round(bf16_ms / max(w8a8_ms, 1e-9), 3),
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


def bench_bigvgan_secondary():
    """BASELINE.json's named secondary metric: BigVGAN v2 samples/sec on
    the reference's benchmark mel (1, 100, 512) — 4.6 s on the MX150
    (reference README.md:32).

    staged=True: the generator split into two jitted halves — the
    2026-08-20 compile helper grinds ~100 min on the composed monolith
    and then FAILS with a Mosaic scoped-VMEM overflow on the fused
    resblock kernel (62 MB stack alloc vs the 16 MB limit, a helper-side
    liveness regression: the identical program compiled and ran at 825k
    samples/s in round 3), while each half compiles in ~35 s
    (models/bigvgan.bigvgan_stage). Measured staged 428-630k samples/s
    across runs (dispatch-bound, tunnel-noisy) vs the monolith's 825k;
    flagged via bigvgan_staged."""
    import jax

    from tts_tpu.models.bigvgan import BigVGANConfig
    from tts_tpu.models.bigvgan import init_params as bv_init
    from tts_tpu.runtime.vocoder import BigVGANVocoder

    cfg = BigVGANConfig()
    dt = jax.numpy.bfloat16
    params = jax.jit(lambda k: bv_init(cfg, k, dt))(jax.random.key(0))
    voc = BigVGANVocoder(params, cfg, dtype=dt)
    stats = voc.benchmark(mel_frames=512, iters=20, staged=True)
    sps = stats["samples_per_sec"]
    base = 512 * 256 / 4.6
    return {"bigvgan_metric": "bigvgan_v2_24k mel(1,100,512)",
            "bigvgan_samples_per_s": round(sps, 0),
            "bigvgan_staged": True,
            "bigvgan_vs_baseline": round(sps / base, 1)}


def bench_kani_int4():
    """Driver-verified int4 evidence (VERDICT r3 item 6): Kani 370m-shape
    int4 (k_quant-style scale search, group 32) decode tok/s against the
    reference's Q4F32 row (/root/reference/README.md:34: 5.2 s / RTF 0.87
    on i7-1165G7). Kani emits 4 codec tokens per 12.5 Hz frame, so
    real-time is 50 tok/s: RTF = 50 / tok_s. int8 measured alongside for
    the documented int8-is-the-speed-mode comparison (NOTES.md)."""
    import time

    import numpy as np

    from tts_tpu.models.kani import KaniConfig, init_params
    from tts_tpu.models.nanocodec import NanoCodecConfig
    from tts_tpu.models.nanocodec import init_params as codec_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline

    if jax.devices()[0].platform != "tpu":
        return {}
    cfg = KaniConfig(max_seq_len=2048, stop_token=-1)
    params = jax.jit(lambda k: init_params(cfg, k, jnp.bfloat16))(
        jax.random.key(0))
    ccfg = NanoCodecConfig()
    cparams = jax.jit(lambda k: codec_init(ccfg, k, jnp.bfloat16))(
        jax.random.key(1))
    ids = np.array([[3, 9, 4, 17, 2]], np.int32)
    out = {}
    for bits, key in ((4, "kani_int4"), (8, "kani_int8")):
        pipe = KaniPipeline(params, cfg, cparams, ccfg,
                            KaniDecodeConfig(max_new_tokens=256,
                                             repeat_penalty=1.0),
                            quantize=bits)
        pipe.synthesize_ids(ids)                   # compile
        t0 = time.perf_counter()
        _wav, stats = pipe.synthesize_ids(ids)    # device_get-fenced
        wall = time.perf_counter() - t0
        tok_s = stats["tokens"] / wall
        out[f"{key}_tok_s"] = round(tok_s, 1)
        out[f"{key}_rtf"] = round(50.0 / tok_s, 4)
    out["kani_int4_vs_baseline"] = round(0.87 / out["kani_int4_rtf"], 1)
    return out


def bench_kani_continuous():
    """Driver-verified continuous-serving evidence: the Kani slot server
    (serving/slots) under a Poisson request stream on the real chip —
    per-request p50/p99 latency and mid-decode admission count. 370m-
    shape config, int8, 96-token generations at 4 rps x 12 (sized so the
    section fits the aux budget even on a cold cache — the round-4 ask
    is that these keys finally appear driver-side at all)."""
    import time

    import numpy as np

    from tts_tpu.models.kani import KaniConfig, init_params
    from tts_tpu.models.nanocodec import NanoCodecConfig
    from tts_tpu.models.nanocodec import init_params as codec_init
    from tts_tpu.runtime.kani import KaniDecodeConfig, KaniPipeline
    from tts_tpu.serving.continuous import KaniSlotServer

    if jax.devices()[0].platform != "tpu":
        return {}
    cfg = KaniConfig(max_seq_len=4096, stop_token=-1)
    params = jax.jit(lambda k: init_params(cfg, k, jnp.bfloat16))(
        jax.random.key(0))
    ccfg = NanoCodecConfig()
    cparams = jax.jit(lambda k: codec_init(ccfg, k, jnp.bfloat16))(
        jax.random.key(1))
    pipe = KaniPipeline(params, cfg, cparams, ccfg,
                        KaniDecodeConfig(max_new_tokens=96,
                                         repeat_penalty=1.0),
                        quantize=8)
    srv = KaniSlotServer(pipe, slots=4, chunk=32, prompt_bucket=16)
    n_req = 12
    try:
        srv.submit(np.array([[3, 9, 4]], np.int32)).result(
            timeout=420)                                    # warm/compile
        rng = np.random.default_rng(0)
        futs = []
        for i in range(n_req):
            ids = np.array([[3 + (i % 50), 9, 4 + (i % 7)]], np.int32)
            t0 = time.perf_counter()
            futs.append((srv.submit(ids), t0))
            if i + 1 < n_req:
                time.sleep(float(rng.exponential(0.25)))    # ~4 rps
        lats = []
        for fut, t0 in futs:
            fut.result(timeout=300)
            lats.append(time.perf_counter() - t0)
        lats.sort()
        snap = srv.stats.snapshot()
    finally:
        srv.close()
    return {
        "serving_metric": "kani 370m int8 continuous batching, "
                          "4 rps x 12, 96-token generations",
        "serving_p50_ms": round(lats[len(lats) // 2] * 1e3, 1),
        "serving_p99_ms": round(lats[-1] * 1e3, 1),
        "serving_mid_decode_admissions": snap["admissions_mid_decode"],
    }


def _wait_for_backend(max_wait_s: float = 420.0) -> str:
    """Bounded wait for the TPU backend. The axon tunnel can wedge for tens
    of minutes after a client dies mid-compile (observed in rounds 2 and
    4); jax.devices() then HANGS rather than raising — and can also
    SUCCEED while compile/execute stays blocked behind the dead session
    — so the probe runs a real tiny computation with a device->host
    fetch in a killable subprocess, and the bench only inits in-process
    once a probe succeeds. The patient no-kill rule applies only to a
    HUNG probe (TimeoutExpired): killing a probe mid-compile is itself
    what wedges the tunnel further (round-4 postmortem — three 90s-killed
    probes extended the wedge), and a healthy-but-cold tunnel can take
    >90s to first answer. A probe that EXITS nonzero (transient import or
    connection error, not a wedge) is retried quickly within the same
    deadline — no kill is involved there. Returns "" on success, or an
    error string ("timed out after Ns" / "probe exited nonzero: ...")
    so the caller's JSON line says what actually happened."""
    import subprocess

    probe = ("import jax, jax.numpy as jnp; "
             "print(float(jax.jit(lambda: jnp.ones(8).sum())()))")
    deadline = time.time() + max_wait_s
    last_err = b""
    while True:
        remaining = deadline - time.time()
        if remaining <= 0:
            return ("probe exited nonzero until the %.0fs deadline: %s"
                    % (max_wait_s, last_err.decode(errors="replace")[-160:]))
        try:
            proc = subprocess.run(
                [sys.executable, "-c", probe],
                timeout=remaining, capture_output=True)
        except subprocess.TimeoutExpired:
            return "probe timed out after %.0fs (wedged tunnel)" % max_wait_s
        if proc.returncode == 0:
            return ""
        last_err = proc.stderr or proc.stdout
        time.sleep(2.0)


# Auxiliary sections CHEAPEST-FIRST, each with a cold-run cost estimate
# (seconds, compile included — builder-measured on the tunnel). A section
# only starts if the remaining aux budget covers its estimate, so one
# expensive section cannot starve the cheap ones behind it and a slow
# section cannot ride far past the deadline (round-4 postmortem: "value
# order" + no per-section gate meant four rounds with zero captured
# secondary metrics).
_AUX_SECTIONS = [
    ("w8a8_step", bench_f5_w8a8_step, 95.0),
    ("qwen_secondary", bench_qwen_secondary, 100.0),
    ("kani_int4", bench_kani_int4, 120.0),
    # serving percentiles before the W8A8 latency rerun: the round-4
    # verdict asks for driver-captured serving keys specifically, and
    # w8a8_step above already carries the W8A8 evidence
    ("kani_continuous", bench_kani_continuous, 150.0),
    ("w8a8_latency", bench_f5_w8a8_latency, 90.0),
    # LAST on purpose: the 2026-08-20 compile helper hangs indefinitely
    # on this one program (two independent processes stuck >30 min in
    # tcp_recv on its compile, while matmul and small-conv probes
    # compile normally) — if it wedges, only this section is lost and
    # the watchdog annotates it; everything driver-valuable already
    # printed cumulatively above
    ("bigvgan_secondary", bench_bigvgan_secondary, 45.0),
]

# Aux wall budget measured from when the PRIMARY metric prints — not from
# process start. Round-4 postmortem: the 480 s process-start budget was
# consumed by the backend probe (up to 420 s of environment wedge, not
# bench work) plus the cold primary (493 s in the driver env), so every
# aux section was skipped by construction. The probe wait and the primary
# are both outside this budget; the primary itself is additionally
# bounded by the driver's own process timeout, against which the
# immediate primary print already defends.
#
# 600 s: warm-cache the full chain runs in ~250 s (jitted quantize +
# persistent executables); cold, each section recompiles and a 420 s
# budget dropped the last two. Running longer is safe by construction —
# every section reprints the cumulative JSON, so a driver kill at any
# point still leaves a maximal valid last line.
_AUX_BUDGET_S = 600.0


if __name__ == "__main__":
    _t0 = time.time()
    from tts_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    probe_err = _wait_for_backend()
    if probe_err:
        print(json.dumps({
            "metric": "f5_tts_nfe32 end-to-end RTF/chip, sustained "
                      "(6s ref, 15 words; exact path)",
            "value": None, "unit": "rtf", "vs_baseline": None,
            "error": "TPU backend unavailable (%s); refusing to hang — "
                     "rerun when the backend recovers" % probe_err,
        }), flush=True)
        sys.exit(0)
    _t_probe = time.time()
    # No-kill witness on the primary too: the remote compile helper was
    # observed (2026-08-20) to pass the tiny probe yet hang indefinitely
    # on big programs — without this, a driver-side kill would leave an
    # empty capture with no explanation. The real primary line prints
    # LAST and supersedes these.
    import threading
    _primary_done = threading.Event()

    def _primary_watchdog():
        if _primary_done.wait(600.0):
            return
        while True:
            print(json.dumps({
                "metric": "f5_tts_nfe32 end-to-end RTF/chip, sustained "
                          "(6s ref, 15 words; exact path)",
                "value": None, "unit": "rtf", "vs_baseline": None,
                "error": "primary still compiling/executing after "
                         f"{time.time() - _t_probe:.0f}s — backend probe "
                         "passed but the compile helper looks wedged",
            }), flush=True)
            if _primary_done.wait(300.0):
                return

    threading.Thread(target=_primary_watchdog, daemon=True).start()
    try:
        result = bench_f5()
    finally:
        _primary_done.set()
    result["t_primary_s"] = round(time.time() - _t_probe, 1)
    print(json.dumps(result), flush=True)     # primary is now un-droppable
    deadline = time.time() + _AUX_BUDGET_S
    skipped = []

    _result_lock = threading.Lock()   # watchdog snapshot vs section update

    def _watchdog(name, est_s, started, done_evt):
        """No-kill witness: if a section runs far past its estimate (a
        wedged tunnel RPC blocks in tcp_recv indefinitely — observed
        2026-08-20 mid-bigvgan), reprint the cumulative JSON annotated
        with where time is going so a later driver kill still leaves
        evidence of WHICH section wedged. Never interrupts the section:
        killing mid-compile is what wedges the tunnel further."""
        if done_evt.wait(2 * est_s):
            return
        while True:
            with _result_lock:        # dict(result) vs result.update race
                snap = dict(result)
            snap["aux_in_progress"] = name
            snap["aux_in_progress_s"] = round(time.time() - started, 1)
            if skipped:
                snap["skipped"] = list(skipped)
            print(json.dumps(snap), flush=True)
            if done_evt.wait(300.0):
                return

    for name, fn, est_s in _AUX_SECTIONS:
        if time.time() + est_s > deadline:
            skipped.append(name)
            continue
        done_evt = threading.Event()
        wd = threading.Thread(target=_watchdog,
                              args=(name, est_s, time.time(), done_evt),
                              daemon=True)
        wd.start()
        try:
            section = fn()
        except Exception as e:  # auxiliary metrics must not sink the primary
            section = {f"{name}_error": repr(e)[:200]}
        finally:
            done_evt.set()
        with _result_lock:
            result.update(section)
            result["t_elapsed_s"] = round(time.time() - _t0, 1)
            if skipped:
                result["skipped"] = list(skipped)
        print(json.dumps(result), flush=True)  # cumulative, valid, maximal
    if skipped:
        result["skipped"] = skipped
        print(json.dumps(result), flush=True)
