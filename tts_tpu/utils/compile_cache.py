"""Persistent XLA compilation cache + serving warmup.

The reference pays graph-build cost once per process when it creates its
ONNX Runtime sessions (F5_TTS/F5-TTS-ONNX-Inference.py:152-169); the ORT
kernel binaries ship precompiled, so a process restart costs only session
setup. Under jit the analogous cold-start cost is XLA compilation —
~20-40 s per large pipeline program — paid on the FIRST call of every
(shape-bucket, program) pair in every fresh process.

`enable_compile_cache` turns on JAX's persistent compilation cache:
compiled executables are memoized on disk keyed by HLO fingerprint, so a
restarted server (same model config, same buckets) loads its programs
from disk instead of recompiling. `warmup` drives a pipeline through its
bucket ladder once so a serving process takes the compile hit (or the
cache read) at startup instead of on the first live request.

Both are beyond-reference serving features; the reference has no serving
layer (SURVEY.md §2.9).
"""
from __future__ import annotations

import os
import time

__all__ = ["enable_compile_cache", "warmup"]

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "tts_tpu", "xla-cache")


def enable_compile_cache(path: str | None = None, *,
                         min_entry_size_bytes: int = 0,
                         min_compile_time_secs: float = 0.5) -> str:
    """Enable the on-disk XLA compilation cache for this process.

    Call before the first jit compilation (programs compiled earlier are
    not retroactively cached). `min_compile_time_secs` skips trivially
    cheap programs by default so the cache holds the expensive pipeline
    programs, not every scalar helper; pass 0.0 to cache everything.
    Returns the cache directory.
    """
    import jax

    path = path or _DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes",
                      int(min_entry_size_bytes))
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_time_secs))
    return path


def warmup(synthesize, requests, *, log=None) -> float:
    """Run `synthesize(request)` for each warmup request, sequentially,
    so every shape bucket on the serving path is compiled (or read from
    the persistent cache) before live traffic. Returns the total warmup
    wall time in seconds.

    `requests` is a list of argument tuples; each is splatted into
    `synthesize`. Outputs are discarded.
    """
    t0 = time.perf_counter()
    for i, req in enumerate(requests):
        t = time.perf_counter()
        synthesize(*req)
        if log is not None:
            log(f"warmup {i + 1}/{len(requests)}: "
                f"{time.perf_counter() - t:.1f}s")
    return time.perf_counter() - t0
