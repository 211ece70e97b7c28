"""Batched prefill over a padded bucket must equal the serial
one-position-at-a-time prefill (same logits / dit hidden, same caches for
the valid region) — the correctness contract behind the KV-rewind trick."""
import jax
import jax.numpy as jnp
import numpy as np


def test_kani_batched_prefill_matches_serial():
    from tests.test_kani import TINY
    from tts_tpu.models.kani import embed_tokens, init_params, init_state, kani_step

    params = init_params(TINY, jax.random.key(0))
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(1, TINY.vocab_size, (1, 7)), jnp.int32)

    # serial
    state_s = init_state(TINY, kv_dtype=jnp.float32)
    for i in range(7):
        h = embed_tokens(params, prompt[:, i:i + 1])
        logits_s, state_s = kani_step(params, h, state_s, TINY)

    # batched over a padded bucket of 16
    buf = jnp.zeros((1, 16), jnp.int32).at[:, :7].set(prompt)
    state_b = init_state(TINY, kv_dtype=jnp.float32)
    h = embed_tokens(params, buf)
    logits_b, state_b = kani_step(params, h, state_b, TINY,
                                  valid_len=jnp.int32(7))

    np.testing.assert_allclose(np.asarray(logits_b), np.asarray(logits_s),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(state_b.conv[:, :, :, :]),
                               np.asarray(state_s.conv), atol=2e-5)
    # kv content for the valid region matches
    np.testing.assert_allclose(np.asarray(state_b.kv.k[:, :, :, :7]),
                               np.asarray(state_s.kv.k[:, :, :, :7]),
                               atol=2e-5)


def test_voxcpm_batched_prefill_matches_serial():
    from tests.test_voxcpm import TINY
    from tts_tpu.kv.cache import KVCache
    from tts_tpu.models.voxcpm import init_params, voxcpm_main_step

    params = init_params(TINY, jax.random.key(0))
    b = TINY.base
    rng = np.random.default_rng(1)
    n = 5
    text = rng.integers(1, TINY.vocab_size, (1, 8)).astype(np.int32)
    fe = (rng.standard_normal((1, 8, b.hidden_size)) * 0.1).astype(np.float32)
    is_audio = np.array([False, False, True, True, False, False, False,
                         False])  # interleaved (v2-style)

    def fresh():
        return (KVCache.create(b.num_layers, 1, b.num_kv_heads,
                               b.max_seq_len, b.head_dim, jnp.float32),
                KVCache.create(TINY.residual.num_layers, 1,
                               TINY.residual.num_kv_heads, b.max_seq_len,
                               TINY.residual.head_dim, jnp.float32))

    # serial
    bkv, rkv = fresh()
    for i in range(n):
        h = jnp.where(is_audio[i], jnp.asarray(fe[:, i:i + 1]),
                      params["embed"][text[:, i:i + 1]])
        ctl = jnp.int32(0 if is_audio[i] else 1)
        dit_s, stop_s, bkv, rkv = voxcpm_main_step(
            params, h, jnp.asarray(fe[:, i:i + 1]), ctl, bkv, rkv, TINY)

    # batched over the padded bucket of 8
    bkv2, rkv2 = fresh()
    h = jnp.where(jnp.asarray(is_audio)[None, :, None], jnp.asarray(fe),
                  params["embed"][jnp.asarray(text)])
    dit_b, stop_b, bkv2, rkv2 = voxcpm_main_step(
        params, h, jnp.asarray(fe), jnp.asarray(is_audio), bkv2, rkv2,
        TINY, valid_len=jnp.int32(n))

    np.testing.assert_allclose(np.asarray(dit_b), np.asarray(dit_s),
                               atol=3e-5)
    assert int(stop_b) == int(stop_s)
    np.testing.assert_allclose(np.asarray(bkv2.k[:, :, :, :n]),
                               np.asarray(bkv.k[:, :, :, :n]), atol=3e-5)
