"""Persistent compilation cache + serving warmup (utils/compile_cache).

The cache must populate on first compile and be read (not re-written) by
a fresh process compiling the same program — the serving cold-start
feature. Runs in subprocesses so the global jax.config flags don't leak
into the rest of the suite.
"""
import os
import subprocess
import sys

import numpy as np

SCRIPT = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
from tts_tpu.utils.compile_cache import enable_compile_cache
d = enable_compile_cache({cache!r}, min_compile_time_secs=0.0)
import jax, jax.numpy as jnp, numpy as np
f = jax.jit(lambda x: jnp.tanh(x @ x) @ x)
out = f(np.eye(32, dtype=np.float32))
out.block_until_ready()
print("OK", float(out.sum()))
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cache_dir: str) -> str:
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO, cache=cache_dir)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    assert "OK" in proc.stdout
    return proc.stdout


def test_cache_populates_and_is_reused(tmp_path):
    cache = str(tmp_path / "xla-cache")
    out1 = _run(cache)
    entries = os.listdir(cache)
    assert entries, "first process wrote no cache entries"
    mtimes = {e: os.path.getmtime(os.path.join(cache, e)) for e in entries}

    out2 = _run(cache)
    # same program -> same entry set, none rewritten (read, not recompiled)
    entries2 = os.listdir(cache)
    assert set(entries2) == set(entries)
    for e in entries:
        assert os.path.getmtime(os.path.join(cache, e)) == mtimes[e], \
            f"cache entry {e} was rewritten on the second run"
    # and the cached executable computes the same thing
    assert out1.split("OK")[1].strip() == out2.split("OK")[1].strip()


def test_warmup_runs_each_request():
    from tts_tpu.utils.compile_cache import warmup

    seen = []
    secs = warmup(lambda a, b: seen.append((a, b)),
                  [(1, 2), (3, 4)])
    assert seen == [(1, 2), (3, 4)]
    assert secs >= 0.0


def test_default_dir_created(tmp_path, monkeypatch):
    monkeypatch.setenv("HOME", str(tmp_path))
    import importlib

    import tts_tpu.utils.compile_cache as cc
    importlib.reload(cc)
    # enable in a subprocess (config flags are global); here just check
    # the default path derivation
    assert cc._DEFAULT_DIR.startswith(str(tmp_path))
