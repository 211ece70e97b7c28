#!/usr/bin/env python
"""Component-level profile of the Qwen3-TTS per-frame decode iteration.

Ablation timing (same method as f5_profile.py): the talker-frame body
(talker logits -> predictor_frame 15-group scan -> next_talker_input ->
talker step) is scanned N times with components pass-through'd; marginal
cost = full - ablated. Two scan lengths cancel the constant
dispatch/fence tunnel cost (NOTES.md measurement rules).

HBM floor at 0.6B int8: talker ~440 MB/step ~= 0.55 ms, predictor
4 layers x 16 sequential steps ~= 1.2 ms -> ~2 ms/frame ideal vs the
measured ~5.6 ms — this script locates the gap.

Run: python benchmarks/qwen_profile.py [variant ...] [--q8]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.kv.cache import KVCache
from tts_tpu.models.qwen_tts import (
    QwenTTSConfig, init_predictor_params, init_talker_params,
    next_talker_input, predictor_frame, qwen3_stack_step, talker_logits,
)

N1, N2 = 8, 40

cfg = QwenTTSConfig()
t = cfg.talker
dtype = jnp.bfloat16
PARAMS = None
TRAILING = None


def setup(q8: bool = False):
    """Init full-size params (deferred from import so CPU-side tools can
    import the variants without paying a 0.6B init)."""
    global PARAMS, TRAILING, dtype
    dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" \
        else jnp.float32
    PARAMS = jax.jit(lambda k: {**init_talker_params(cfg, k, dtype),
                                **init_predictor_params(cfg, k, dtype)})(
        jax.random.key(0))
    jax.block_until_ready(PARAMS)
    if q8:
        from tts_tpu.quant.weight_only import quantize_pytree

        PARAMS = quantize_pytree(PARAMS, bits=8)
        jax.block_until_ready(PARAMS)
    TRAILING = jnp.zeros((1, 64, t.hidden_size), dtype)


def _mk_state():
    kv = KVCache.create(t.num_layers, 1, t.num_kv_heads, t.max_seq_len,
                        t.head_dim, dtype)
    kv = kv.advance(128)                      # typical post-prefill depth
    hid = jnp.zeros((1, t.hidden_size), dtype)
    return (kv, hid, jnp.zeros((), jnp.int32))


def body(params, c, *, use_talker=True, use_pred=True, use_logits=True,
         use_ntl=True, fused=False, pfused=False):
    kv, hid, num = c
    if use_logits:
        logits = talker_logits(params, hid, cfg)
        tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
    else:
        tok0 = (num % 7)[None] + 1
    if use_pred:
        frame_ids, ce0 = predictor_frame(params, hid[:, None], tok0, cfg,
                                         fused=pfused)
    else:
        frame_ids = jnp.tile(tok0, (cfg.num_code_groups,)) \
            + jnp.arange(cfg.num_code_groups)
        ce0 = params["talker_codec_embed"][tok0][:, None]
    if not use_ntl:
        nxt = ce0 + 0.0 * jnp.sum(frame_ids).astype(dtype)
    else:
        nxt = next_talker_input(params, frame_ids, ce0, TRAILING,
                                jnp.minimum(num, 62), cfg)
    if use_talker:
        pos = kv.length
        rc = jax.lax.dynamic_slice(params["rope_cos"], (pos, 0),
                                   (1, t.head_dim))
        rs = jax.lax.dynamic_slice(params["rope_sin"], (pos, 0),
                                   (1, t.head_dim))
        hid, kv = qwen3_stack_step(params["talker"], nxt, kv, t, rc, rs,
                                   fused=fused)
    else:
        hid = nxt[:, 0] + 0.0 * hid
    return (kv, hid, num + 1)


def _compile_scan(fn, n_iters):
    @jax.jit
    def run(params, state):
        def sbody(c, _):
            return fn(params, c), None

        out, _ = jax.lax.scan(sbody, state, None, length=n_iters)
        return jnp.sum(out[1].astype(jnp.float32))

    state = _mk_state()
    float(run(PARAMS, state))   # compile + warm (fetch fence: see NOTES.md)
    return run, state


def _time_scan(run, state):
    t0 = time.perf_counter()
    float(run(PARAMS, state))
    return time.perf_counter() - t0


def measure(name, fn, passes: int = 4):
    """Best-of-N interleaved short/long scans: the tunnel timing is noisy
    (±0.5 ms swings between processes) so a single pair is unreliable.
    Compiles each scan length once, then repeats the timed passes."""
    run_a, st_a = _compile_scan(fn, N1)
    run_b, st_b = _compile_scan(fn, N2)
    per = min(
        (_time_scan(run_b, st_b) - _time_scan(run_a, st_a))
        / (N2 - N1) * 1000
        for _ in range(passes))
    print(f"{name:<30} {per:8.3f} ms/iter")
    return per


VARIANTS = {
    "full": lambda p, c: body(p, c),
    "no_pred": lambda p, c: body(p, c, use_pred=False),
    "no_talker": lambda p, c: body(p, c, use_talker=False),
    "no_logits": lambda p, c: body(p, c, use_logits=False),
    "pred_only": lambda p, c: body(p, c, use_talker=False, use_logits=False),
    # isolated components (vs `base`): cleaner decomposition than the
    # pairwise marginals when costs interact
    "base": lambda p, c: body(p, c, use_talker=False, use_pred=False,
                              use_logits=False, use_ntl=False),
    "talker_only": lambda p, c: body(p, c, use_pred=False, use_logits=False,
                                     use_ntl=False),
    "predf_only": lambda p, c: body(p, c, use_talker=False, use_logits=False,
                                    use_ntl=False),
    "ntl_only": lambda p, c: body(p, c, use_talker=False, use_pred=False,
                                  use_logits=False),
    "logits_only": lambda p, c: body(p, c, use_talker=False, use_pred=False,
                                     use_ntl=False),
    "predf_fused": lambda p, c: body(p, c, use_talker=False,
                                     use_logits=False, use_ntl=False,
                                     pfused=True),
    # Pallas fused decode-layer kernels (ops/decode_qkv + ops/decode_mlp)
    "talker_fused": lambda p, c: body(p, c, use_pred=False, use_logits=False,
                                      use_ntl=False, fused=True),
    "talker_fqkv": lambda p, c: body(p, c, use_pred=False, use_logits=False,
                                     use_ntl=False, fused="qkv"),
    "talker_fmlp": lambda p, c: body(p, c, use_pred=False, use_logits=False,
                                     use_ntl=False, fused="mlp"),
    "talker_fattn": lambda p, c: body(p, c, use_pred=False, use_logits=False,
                                      use_ntl=False, fused="attn"),
    # W8A8 tail + fused qkv head (--q8 weights required; output-changing)
    "talker_fq8": lambda p, c: body(p, c, use_pred=False, use_logits=False,
                                    use_ntl=False, fused="mlp_q8"),
    "full_fused": lambda p, c: body(p, c, fused=True, pfused=True),
    # qkv+attention single-kernel decode step (ops/decode_step.py)
    "talker_fstep": lambda p, c: body(p, c, use_pred=False,
                                      use_logits=False, use_ntl=False,
                                      fused="step"),
    "predf_fstep": lambda p, c: body(p, c, use_talker=False,
                                     use_logits=False, use_ntl=False,
                                     pfused="step"),
    "full_fstep": lambda p, c: body(p, c, fused="step", pfused="step"),
}

if __name__ == "__main__":
    q8 = "--q8" in sys.argv
    if q8:
        sys.argv.remove("--q8")
    setup(q8)
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        results[name] = measure(name, VARIANTS[name])
    if "full" in results:
        base = results["full"]
        for name, v in results.items():
            if name.startswith("no_"):
                print(f"  marginal {name[3:]:<20} {base - v:8.3f} ms")
