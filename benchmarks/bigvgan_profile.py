"""Where do BigVGAN's 159 ms go? Component A/B scans on the real chip.

Measures, fetch-fenced in-jit scans (NOTES.md measurement rules):
  full        — bigvgan_apply bf16, as shipped
  prec_def    — same with conv PRECISION=DEFAULT (single-pass MXU)
  no_act      — alias-free snake replaced by identity (conv cost only)
  act_only    — the 18-activation chain alone per stage shape
  per-stage   — resblock chain at each (T_i, C_i)

Run: python benchmarks/bigvgan_profile.py [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tts_tpu.models.bigvgan import (BigVGANConfig, bigvgan_apply,
                                    init_params)
from tts_tpu.ops import conv as conv_mod


def timed(fn, args, iters=8, inner=4):
    """Mean ms/call via an in-jit scan of `inner` chained calls."""

    def body(c, _):
        out = fn(args[0], c, *args[2:])
        # chain on the output to prevent elision; keep the carry shape
        return c + out.reshape(-1)[0].astype(c.dtype) * 0.0, None

    @jax.jit
    def scan(x0):
        y, _ = jax.lax.scan(body, x0, None, length=inner)
        return y

    x0 = args[1]
    scan(x0).block_until_ready()
    float(jnp.sum(scan(x0)))          # warm + fence
    t0 = time.perf_counter()
    for _ in range(iters):
        r = scan(x0)
    float(jnp.sum(r))                 # fetch fence
    return (time.perf_counter() - t0) / (iters * inner) * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    cfg = BigVGANConfig()
    dt = jnp.bfloat16
    params = jax.jit(lambda k: init_params(cfg, k, dt))(jax.random.key(0))
    jax.block_until_ready(params)
    mel = jnp.zeros((1, 512, cfg.num_mels), dt)

    def full(params, mel):
        return bigvgan_apply(params, mel, cfg)

    ms = timed(full, (params, mel), iters)
    print(f"full (HIGHEST): {ms:8.2f} ms  "
          f"({512 * 256 / ms * 1e3 / 1e6:.2f} M samples/s)")

    conv_mod.PRECISION = None
    def full_d(params, mel):
        return bigvgan_apply(params, mel, cfg)
    ms_d = timed(full_d, (params, mel), iters)
    print(f"full (DEFAULT): {ms_d:8.2f} ms  "
          f"({512 * 256 / ms_d * 1e3 / 1e6:.2f} M samples/s)")

    # acts replaced by identity -> conv-only cost
    import tts_tpu.models.bigvgan as bv
    real_act = bv._act
    bv._act = lambda x, p, cfg, resample: x
    def no_act(params, mel):
        return bigvgan_apply(params, mel, cfg)
    ms_na = timed(no_act, (params, mel), iters)
    print(f"convs only    : {ms_na:8.2f} ms   -> acts ~ {ms_d - ms_na:.2f} ms")
    bv._act = real_act

    # per-stage resblock chains and acts at the real shapes
    from tts_tpu.audio.filters import AliasFreeResample
    res = AliasFreeResample(2)
    t = 512
    ch = [cfg.upsample_initial_channel] + list(cfg.stage_channels)
    for i, rate in enumerate(cfg.upsample_rates):
        t *= rate
        c = cfg.stage_channels[i]
        x = jnp.zeros((1, t, c), dt)
        blocks = [params["resblocks"][i * cfg.num_kernels + j]
                  for j in range(cfg.num_kernels)]

        def stage(blocks, x):
            acc = None
            for j, (k, dil) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                r = bv._amp_block(x, blocks[j], k, dil, cfg, res)
                acc = r if acc is None else acc + r
            return acc / cfg.num_kernels

        ms_s = timed(stage, (blocks, x), iters)

        def acts(blocks, x):
            y = x
            for j in range(cfg.num_kernels):
                for br in range(3):
                    y = bv._act(y, blocks[j]["acts1"][br], cfg, res)
                    y = bv._act(y, blocks[j]["acts2"][br], cfg, res)
            return y

        ms_a = timed(acts, (blocks, x), iters)
        print(f"stage {i} T={t:6d} C={c:4d}: resblocks {ms_s:7.2f} ms, "
              f"18 acts alone {ms_a:7.2f} ms")


if __name__ == "__main__":
    main()
