"""IndexTTS GPT loader: synthetic UnifiedVoice state dict -> pytree driven
through gpt_step, plus a fold check that the d^-0.25 q/k prescale matches
the reference's export-time c_attn surgery (Export_IndexTTS.py:252-266)."""
import jax
import jax.numpy as jnp
import numpy as np

from tests.test_indextts import TINY
from tts_tpu.kv.cache import KVCache
from tts_tpu.models.indextts import gpt_step
from tts_tpu.weights.indextts_loader import indextts_gpt_from_state_dict


def _build_state_dict(cfg, rng):
    sd = {}
    d = cfg.gpt_dim

    def add(key, *shape, s=0.05):
        sd[key] = (rng.standard_normal(shape) * s).astype(np.float32)

    def ln(pre):
        sd[f"{pre}.weight"] = np.ones(d, np.float32)
        add(f"{pre}.bias", d, s=0.01)

    for i in range(cfg.gpt_layers):
        p = f"gpt.h.{i}"
        add(f"{p}.attn.c_attn.weight", d, 3 * d)     # GPT2 Conv1D (in, out)
        add(f"{p}.attn.c_attn.bias", 3 * d)
        add(f"{p}.attn.c_proj.weight", d, d)
        add(f"{p}.attn.c_proj.bias", d)
        add(f"{p}.mlp.c_fc.weight", d, 4 * d)
        add(f"{p}.mlp.c_fc.bias", 4 * d)
        add(f"{p}.mlp.c_proj.weight", 4 * d, d)
        add(f"{p}.mlp.c_proj.bias", d)
        ln(f"{p}.ln_1")
        ln(f"{p}.ln_2")
    ln("gpt.ln_f")
    ln("final_norm")
    add("text_embedding.weight", 32, d)
    add("text_pos_embedding.emb.weight", 64, d)
    add("mel_embedding.weight", cfg.num_mel_codes, d)
    add("mel_pos_embedding.emb.weight", 64, d)
    add("mel_head.weight", cfg.num_mel_codes, d)
    add("mel_head.bias", cfg.num_mel_codes)
    return sd


def test_gpt_loader_step_runs():
    rng = np.random.default_rng(0)
    sd = _build_state_dict(TINY, rng)
    gpt = indextts_gpt_from_state_dict(sd, TINY)
    kv = KVCache.create(TINY.gpt_layers, 1, TINY.gpt_heads, 32,
                        TINY.gpt_head_dim, jnp.float32)
    h = jnp.asarray(rng.standard_normal((1, 3, TINY.gpt_dim)) * 0.1,
                    jnp.float32)
    ones = jnp.ones((1, TINY.num_mel_codes), jnp.float32)
    logits, last, kv = jax.jit(
        lambda g, h, kv: gpt_step(g, h, kv, ones, TINY))(gpt, h, kv)
    assert logits.shape == (1, TINY.num_mel_codes)
    assert last.shape == (1, TINY.gpt_dim)
    assert int(kv.length) == 3
    assert np.isfinite(np.asarray(logits)).all()


def test_gpt_loader_qk_prescale_fold():
    """wqkv columns for q and k carry d^-0.25; v columns are untouched."""
    rng = np.random.default_rng(1)
    sd = _build_state_dict(TINY, rng)
    gpt = indextts_gpt_from_state_dict(sd, TINY)
    d = TINY.gpt_dim
    scale = TINY.gpt_head_dim ** -0.25
    raw = sd["gpt.h.0.attn.c_attn.weight"]           # (in, 3d)
    got = np.asarray(gpt["layers"][0]["wqkv"])
    np.testing.assert_allclose(got[:, :2 * d], raw[:, :2 * d] * scale,
                               rtol=1e-6)
    np.testing.assert_allclose(got[:, 2 * d:], raw[:, 2 * d:], rtol=1e-6)
