"""KV-cache decode equivalence and decode-strategy semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from tts_tpu.decoding import (
    apply_repetition_penalty,
    beam_init,
    beam_step,
    greedy,
)
from tts_tpu.kv import KVCache
from tts_tpu.nn import attention_mask, gqa_attention


def test_kv_cache_prefill_then_decode_equals_full():
    """Attention over an incrementally-built cache == attention over the full
    sequence (the static-buffer re-design of the reference's KV concat)."""
    b, kvh, h, d, t_max = 1, 2, 4, 16, 12
    rng = np.random.default_rng(0)
    seq = 8
    q_all = rng.standard_normal((b, seq, h, d)).astype(np.float32)
    k_all = rng.standard_normal((b, seq, kvh, d)).astype(np.float32)
    v_all = rng.standard_normal((b, seq, kvh, d)).astype(np.float32)

    # full causal attention
    k_f = np.swapaxes(k_all, 1, 2)
    v_f = np.swapaxes(v_all, 1, 2)
    mask_full = attention_mask(seq, seq, 0, seq)
    ref = np.asarray(gqa_attention(q_all, k_f, v_f, mask_full, scale=d**-0.5))

    # prefill 5, then 3 single-token decode steps through the cache
    cache = KVCache.create(1, b, kvh, t_max, d, dtype=jnp.float32)
    cache, k_view, v_view = cache.update_layer(0, k_all[:, :5], v_all[:, :5])
    cache = cache.advance(5)
    m = attention_mask(5, t_max, 0, cache.length)
    out_pre = np.asarray(gqa_attention(q_all[:, :5], k_view, v_view, m, scale=d**-0.5))
    np.testing.assert_allclose(out_pre, ref[:, :5], rtol=2e-4, atol=2e-4)

    for i in range(5, 8):
        cache, k_view, v_view = cache.update_layer(
            0, k_all[:, i : i + 1], v_all[:, i : i + 1]
        )
        cache = cache.advance(1)
        m = attention_mask(1, t_max, cache.length - 1, cache.length)
        out_i = np.asarray(
            gqa_attention(q_all[:, i : i + 1], k_view, v_view, m, scale=d**-0.5)
        )
        np.testing.assert_allclose(out_i, ref[:, i : i + 1], rtol=2e-4, atol=2e-4)


def test_repetition_penalty_matches_reference_semantics():
    """gather → ×penalty → scatter over the last `range` ids; only once the
    window is full (Kani_TTS/Export_Kani_TTS.py:168-178)."""
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, -1.0]])
    save = jnp.asarray([[2, 3, 0, 0]], jnp.int32)

    # window not yet full -> unchanged
    out = apply_repetition_penalty(logits, save, jnp.int32(1), 0.5, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(logits))

    # 2 decoded, range 2 -> ids [2, 3] halved
    out = apply_repetition_penalty(logits, save, jnp.int32(2), 0.5, 2)
    np.testing.assert_allclose(np.asarray(out)[0], [1.0, 2.0, 1.5, 2.0, -1.0])


def test_beam_search_matches_numpy_reference():
    """beam_init/beam_step vs a brute-force numpy implementation of the
    reference's logsumexp+topk algebra (Kani_TTS/Export_Kani_TTS.py:93-165)."""
    rng = np.random.default_rng(1)
    v, beam, topk = 11, 3, 4
    l0 = rng.standard_normal((1, v)).astype(np.float32)
    st = beam_init(jnp.asarray(l0), beam)

    lp0 = l0[0] - np.log(np.exp(l0[0]).sum())
    order = np.argsort(-lp0)[:beam]
    np.testing.assert_array_equal(np.asarray(st.tokens), order)
    np.testing.assert_allclose(np.asarray(st.log_probs)[:, 0], lp0[order], rtol=1e-4, atol=1e-4)

    l1 = rng.standard_normal((beam, v)).astype(np.float32)
    st2 = beam_step(jnp.asarray(l1), st.log_probs, beam, topk)

    lp1 = l1 - np.log(np.exp(l1).sum(-1, keepdims=True))
    # restrict to top_k per row as the reference does
    cand = np.full_like(lp1, -np.inf)
    for r in range(beam):
        ix = np.argsort(-lp1[r])[:topk]
        cand[r, ix] = lp1[r, ix]
    joint = cand + np.asarray(st.log_probs)
    flat = np.argsort(-joint.reshape(-1))[:beam]
    np.testing.assert_array_equal(np.asarray(st2.parent), flat // v)
    np.testing.assert_array_equal(np.asarray(st2.tokens), flat % v)


def test_kv_cache_beam_ops():
    cache = KVCache.create(2, 1, 2, 8, 4)
    cache = cache.repeat_batch(3)
    assert cache.k.shape == (2, 3, 2, 8, 4)
    idx = jnp.asarray([2, 0, 1], jnp.int32)
    sel = cache.select_batch(idx)
    assert sel.k.shape == cache.k.shape


def test_greedy():
    out = greedy(jnp.asarray([[0.1, 3.0, -2.0], [5.0, 1.0, 2.0]]))
    assert np.asarray(out).tolist() == [1, 0]
