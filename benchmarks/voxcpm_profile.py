#!/usr/bin/env python
"""Component-level profile of the VoxCPM-1.5 per-latent decode iteration.

Same ablation method as f5_profile.py: the generation-loop body (CFM
decoder -> feat encoder -> dual-LM step) is scanned N times with
individual components replaced by pass-throughs; marginal cost =
full - ablated. Two scan lengths cancel the constant dispatch/fence
tunnel cost (NOTES.md measurement rules).

Run: python benchmarks/voxcpm_profile.py [variant ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.models.voxcpm import (
    VoxCPMConfig, cfm_feat_decoder, feat_encoder_cond, init_params,
    voxcpm_main_step,
)
from tts_tpu.kv.cache import KVCache

N1, N2 = 16, 96

cfg = VoxCPMConfig()
dtype = jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
PARAMS = jax.jit(lambda k: init_params(cfg, k, dtype))(jax.random.key(0))
jax.block_until_ready(PARAMS)

b = cfg.base


def _mk_state():
    base_kv = KVCache.create(b.num_layers, 1, b.num_kv_heads, b.max_seq_len,
                             b.head_dim, dtype)
    res_kv = KVCache.create(cfg.residual.num_layers, 1,
                            cfg.residual.num_kv_heads, b.max_seq_len,
                            cfg.residual.head_dim, dtype)
    base_kv = base_kv.advance(16)
    res_kv = res_kv.advance(16)
    dit = jnp.zeros((1, 1, cfg.estimator.hidden_size), dtype)
    feat_cond = jnp.zeros((2, cfg.patch_size, cfg.estimator.hidden_size),
                          dtype)
    key = jax.random.key(1)
    return (base_kv, res_kv, dit, feat_cond, key)


STATE = _mk_state()


def gbody(params, c, *, use_cfm=True, use_fe=True, use_main=True):
    base_kv, res_kv, dit, feat_cond, key = c
    key, sub = jax.random.split(key)
    noise = jax.random.normal(sub, (1, cfg.patch_size, cfg.vae.latent_dim))
    if use_cfm:
        latent = cfm_feat_decoder(params, noise, dit, feat_cond, cfg)
    else:
        latent = noise + 0.0 * dit[..., :1]
    if use_fe:
        feat_embed, feat_cond = feat_encoder_cond(
            params, latent.astype(dtype), cfg)
        feat_cond = feat_cond.astype(dtype)
    else:
        feat_embed = jnp.zeros((1, 1, b.hidden_size), dtype) \
            + 0.0 * latent[..., :1].astype(dtype)
    h = feat_embed[:, :1].astype(dtype)
    if use_main:
        dit, stop, base_kv, res_kv = voxcpm_main_step(
            params, h, h, jnp.int32(0), base_kv, res_kv, cfg)
    else:
        dit = dit + 0.0 * h[..., :1]
    return (base_kv, res_kv, dit, feat_cond, key)


def _time_scan(fn, n_iters):
    @jax.jit
    def run(params, state):
        def body(c, _):
            return fn(params, c), None

        out, _ = jax.lax.scan(body, state, None, length=n_iters)
        return jnp.sum(out[2].astype(jnp.float32))

    s = run(PARAMS, STATE)
    float(s)   # fetch fence: block_until_ready acks early over the tunnel
    t0 = time.perf_counter()
    s = run(PARAMS, STATE)
    float(s)                        # device->host fetch fence
    return time.perf_counter() - t0


def measure(name, fn):
    t_a = _time_scan(fn, N1)
    t_b = _time_scan(fn, N2)
    per = (t_b - t_a) / (N2 - N1) * 1000
    print(f"{name:<30} {per:8.3f} ms/iter")
    return per


VARIANTS = {
    "full": lambda p, c: gbody(p, c),
    "no_cfm": lambda p, c: gbody(p, c, use_cfm=False),
    "no_fe": lambda p, c: gbody(p, c, use_fe=False),
    "no_main": lambda p, c: gbody(p, c, use_main=False),
    "cfm_only": lambda p, c: gbody(p, c, use_fe=False, use_main=False),
    "main_only": lambda p, c: gbody(p, c, use_cfm=False, use_fe=False),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        results[name] = measure(name, VARIANTS[name])
    if "full" in results:
        base = results["full"]
        for name, v in results.items():
            if name.startswith("no_"):
                print(f"  marginal {name[3:]:<20} {base - v:8.3f} ms")
