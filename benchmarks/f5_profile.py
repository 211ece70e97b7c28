#!/usr/bin/env python
"""Component-level profile of the F5 DiT Euler step on the TPU.

Ablation timing: one real DiT block (T=1408, batch-2 CFG, bf16 — the
README-benchmark shape) is scanned N times with individual sub-components
replaced by pass-throughs; the marginal cost of a component = full - ablated.
This keeps XLA's real fusion context (isolated micro-benchmarks overcount
boundary relayouts). Two scan lengths cancel the constant ~30-70 ms
dispatch/fence tunnel cost (NOTES.md measurement rules; params ride as jit
args so the compile request stays small).

Run: python benchmarks/f5_profile.py [variant ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.f5 import (
    F5Config, _dit_attention, _rope_qkv_flat, dit_forward, init_params,
    input_embedding,
)
from tts_tpu.nn.norm import layer_norm
from tts_tpu.quant.weight_only import dense

T = 1408
N1, N2 = 8, 40


def _time_scan(fn, state, n_iters):
    @jax.jit
    def run(params, state):
        def body(c, _):
            return fn(params, c), None

        out, _ = jax.lax.scan(body, state, None, length=n_iters)
        return jnp.sum(out.astype(jnp.float32))

    s = run(PARAMS, state)          # compile + warm
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    s = run(PARAMS, state)
    float(s)                        # device->host fetch fence
    return time.perf_counter() - t0


def measure(name, fn, state):
    t_a = _time_scan(fn, state, N1)
    t_b = _time_scan(fn, state, N2)
    per = (t_b - t_a) / (N2 - N1) * 1000
    print(f"{name:<30} {per:8.3f} ms/iter")
    return per


cfg = F5Config()
dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
PARAMS = jax.jit(lambda k: init_params(cfg, k, dtype))(jax.random.key(0))
jax.block_until_ready(PARAMS)

key = jax.random.key(1)
noise = jax.random.normal(key, (1, T, cfg.n_mels), jnp.float32)
cond = jax.random.normal(key, (1, T, cfg.n_mels + cfg.text_dim), dtype) * 0.1
x2 = jax.random.normal(key, (2, T, cfg.dim), dtype) * 0.1
duration = jnp.int32(T - 15)


def full_step(params, carry):
    pred, pred1 = dit_forward(
        params, carry.astype(dtype), cond, jnp.zeros_like(cond),
        params["time_table"][0], params["rope_cos"][:T],
        params["rope_sin"][:T], cfg, kv_len=duration, step_idx=0)
    upd = (pred + (pred - pred1) * cfg.cfg_strength).astype(jnp.float32)
    return carry + upd * params["delta_t"][0]


# --- one-block variants: ablate a component, keep the rest identical -------

def _block(params, x, *, attn="full", mlp=True, use_ln=True):
    p = params["blocks"][0]
    mod = params["ada_table"][0, 0].reshape(1, 1, -1)
    s1, c1, g1, s2, c2, g2 = jnp.split(mod, 6, axis=-1)
    norm = layer_norm(x, eps=1e-6) * (1 + c1) + s1 if use_ln else x

    if attn == "full":
        a = _dit_attention(p["attn"], norm, params["rope_cos"][:T],
                           params["rope_sin"][:T], cfg.heads, cfg.head_dim,
                           duration)
    elif attn == "noflash":
        # qkv matmul + rope + (v pass-through instead of the flash kernel)
        # + out proj: isolates the flash kernel itself
        qkv = dense(norm, p["attn"]["wqkv"]) + p["attn"]["bqkv"]
        q, k, v = _rope_qkv_flat(qkv, params["rope_cos"][:T],
                                 params["rope_sin"][:T], cfg.heads,
                                 cfg.head_dim)
        o = (q + k + v).transpose(0, 2, 1, 3).reshape(x.shape[0], T, -1)
        a = dense(o, p["attn"]["wo"]) + p["attn"]["bo"]
    elif attn == "norope":
        # qkv matmul + flash, no rope prologue (plain split + transpose)
        from tts_tpu.ops.flash_attention import flash_attention

        qkv = dense(norm, p["attn"]["wqkv"]) + p["attn"]["bqkv"]
        qkvh = qkv.reshape(x.shape[0], T, 3 * cfg.heads, cfg.head_dim)
        qkvh = qkvh.transpose(0, 2, 1, 3)
        q, k, v = (qkvh[:, :cfg.heads], qkvh[:, cfg.heads:2 * cfg.heads],
                   qkvh[:, 2 * cfg.heads:])
        o = flash_attention(q, k, v, duration, block_q=128, block_kv=T,
                            head_block=2, packed_out=True)
        a = dense(o, p["attn"]["wo"]) + p["attn"]["bo"]
    elif attn == "none":
        a = norm
    x = x + g1 * a

    if mlp:
        from tts_tpu.ops.dit_mlp import mlp_block_fused

        mods = jnp.concatenate([s2[0], c2[0], g2[0]], axis=0)
        return mlp_block_fused(x, mods, p["ff1"]["w"], p["ff1"]["b"],
                               p["ff2"]["w"], p["ff2"]["b"])
    return x


def _quantize_blocks(params, attn=True, mlp=True):
    """Same DiT-matmul-only int8 policy as F5Pipeline(quantize=8).
    attn/mlp toggles quantize only that sub-module (in-context ablation:
    _dit_block routes each sub-module to its q8 kernel iff its weights are
    QTensors, so partially-quantized params time one kernel swap at a time
    inside the REAL full step)."""
    from tts_tpu.quant.weight_only import quantize_int8

    blocks = [
        {
            **blk,
            "attn": {**blk["attn"],
                     "wqkv": quantize_int8(blk["attn"]["wqkv"]),
                     "wo": quantize_int8(blk["attn"]["wo"])}
            if attn else blk["attn"],
            "ff1": {**blk["ff1"], "w": quantize_int8(blk["ff1"]["w"])}
            if mlp else blk["ff1"],
            "ff2": {**blk["ff2"], "w": quantize_int8(blk["ff2"]["w"])}
            if mlp else blk["ff2"],
        }
        for blk in params["blocks"]
    ]
    return {**params, "blocks": blocks}


def _block_q8(params, x, *, attn="q8", mlp="q8"):
    """One DiT block with the W8A8 kernels, component-ablatable: attn in
    {q8, bf16, none}, mlp in {q8, bf16, none}. Pass q8-quantized PARAMS."""
    from tts_tpu.ops.dit_mlp import mlp_block_fused_q8
    from tts_tpu.ops.quant_matmul import ln_qkv_q8, out_proj_residual_q8

    p = params["blocks"][0]
    mod = params["ada_table"][0, 0].reshape(1, 1, -1)
    s1, c1, g1, s2, c2, g2 = jnp.split(mod, 6, axis=-1)

    if attn == "q8":
        wqkv, wo = p["attn"]["wqkv"], p["attn"]["wo"]
        mods_a = jnp.concatenate([s1[0], c1[0]], axis=0)
        qkv = ln_qkv_q8(x, mods_a, wqkv.q, wqkv.scale, p["attn"]["bqkv"])
        q, k, v = _rope_qkv_flat(qkv, params["rope_cos"][:T],
                                 params["rope_sin"][:T], cfg.heads,
                                 cfg.head_dim)
        from tts_tpu.models.f5 import _flash_packed

        o = _flash_packed(q, k, v, duration, cfg.head_dim)
        x = out_proj_residual_q8(o, wo.q, wo.scale, p["attn"]["bo"],
                                 g1.reshape(-1), x)
    elif attn == "none":
        pass

    if mlp == "q8":
        mods = jnp.concatenate([s2, c2, g2], axis=1)[0][None]
        x = mlp_block_fused_q8(
            x, mods, p["ff1"]["w"].q, p["ff1"]["w"].scale, p["ff1"]["b"],
            p["ff2"]["w"].q, p["ff2"]["w"].scale, p["ff2"]["b"])
    return x


def _full_step_for(cfg_v):
    """full_step bound to an alternate config (e.g. ff_mult=4): the
    step-time slope vs ff width is the true in-context MLP matmul cost —
    structural ablations can't remove the MLP without disturbing the
    kernel schedule, but widening it only adds matmul work."""
    def fn(params, carry):
        pred, pred1 = dit_forward(
            params, carry.astype(dtype), cond, jnp.zeros_like(cond),
            params["time_table"][0], params["rope_cos"][:T],
            params["rope_sin"][:T], cfg_v, kv_len=duration, step_idx=0)
        upd = (pred + (pred - pred1) * cfg_v.cfg_strength
               ).astype(jnp.float32)
        return carry + upd * params["delta_t"][0]
    return fn


def embed(params, c):
    h = input_embedding(params, c[..., :cfg.n_mels],
                        jnp.concatenate([cond, cond], 0))
    return c + 0.0 * h[..., :c.shape[-1]].astype(c.dtype)


def full_step_nb(n_blocks):
    """full_step with only the first n_blocks DiT blocks: per-block marginal
    = (t22 - t11)/11, non-block remainder = t22 - 22*marginal (embed + final
    LN/proj_out + Euler update + boundary relayouts)."""
    def fn(params, carry):
        p = {**params, "blocks": params["blocks"][:n_blocks],
             "ada_table": params["ada_table"][:, :n_blocks]}
        return full_step(p, carry)
    return fn


VARIANTS = {
    "full_step": (full_step, noise),
    "full_step_nb11": (full_step_nb(11), noise),
    "block_full": (lambda p, c: _block(p, c), x2),
    "block_no_flash": (lambda p, c: _block(p, c, attn="noflash"), x2),
    "block_no_rope": (lambda p, c: _block(p, c, attn="norope"), x2),
    "block_no_attn": (lambda p, c: _block(p, c, attn="none"), x2),
    "block_no_mlp": (lambda p, c: _block(p, c, mlp=False), x2),
    "block_no_ln": (lambda p, c: _block(p, c, use_ln=False), x2),
    "input_embedding": (embed, x2),
}

Q8_VARIANTS = {
    "full_step_q8": (full_step, noise, dict()),
    "full_step_q8_attn": (full_step, noise, dict(mlp=False)),
    "full_step_q8_mlp": (full_step, noise, dict(attn=False)),
    "block_q8": (lambda p, c: _block_q8(p, c), x2, dict()),
    "block_q8_attn_only": (lambda p, c: _block_q8(p, c, mlp="none"), x2,
                           dict()),
    "block_q8_mlp_only": (lambda p, c: _block_q8(p, c, attn="none"), x2,
                          dict()),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    global_params = PARAMS
    q8_cache = {}
    ff4_state = {}
    for name in names:
        import re

        m = re.fullmatch(r"full_step_ff(\d)(_q8)?", name)
        if m:
            mult = int(m.group(1))
            if mult not in ff4_state:
                import dataclasses

                cfg_m = dataclasses.replace(cfg, ff_mult=mult)
                p_m = jax.jit(lambda k: init_params(cfg_m, k, dtype))(
                    jax.random.key(0))
                jax.block_until_ready(p_m)
                entry = {"bf16": p_m, "fn": _full_step_for(cfg_m)}
                entry["q8"] = _quantize_blocks(p_m)
                jax.block_until_ready(entry["q8"])
                ff4_state[mult] = entry
            entry = ff4_state[mult]
            PARAMS = entry["q8" if m.group(2) else "bf16"]
            results[name] = measure(name, entry["fn"], noise)
            continue
        if name in Q8_VARIANTS:
            fn, state, qkw = Q8_VARIANTS[name]
            qkey = tuple(sorted(qkw.items()))
            if qkey not in q8_cache:
                q8_cache[qkey] = _quantize_blocks(global_params, **qkw)
                jax.block_until_ready(q8_cache[qkey])
            PARAMS = q8_cache[qkey]
        else:
            fn, state = VARIANTS[name]
            PARAMS = global_params
        results[name] = measure(name, fn, state)
    if "block_full" in results:
        base = results["block_full"]
        for name, v in results.items():
            if name.startswith("block_no"):
                print(f"  marginal {name[9:]:<20} {base - v:8.3f} ms")
        if "full_step" in results:
            print(f"  22 x block                   {22 * base:8.3f} ms")
