"""Weight-only int8 quantization: numerics, pytree pass, and a quantized
Kani decode smoke test."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.quant.weight_only import (
    QTensor,
    dense,
    dequantize,
    quantize_int8,
    quantize_pytree,
)


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    qt = quantize_int8(w)
    assert qt.q.dtype == jnp.int8
    assert qt.scale.shape == (128,)
    deq = dequantize(qt, jnp.float32)
    # int8 per-channel symmetric: relative error bounded by ~1/127 per chan
    err = np.abs(np.asarray(deq - w)).max(axis=0)
    amax = np.abs(np.asarray(w)).max(axis=0)
    assert (err <= amax / 127.0 * 0.51 + 1e-6).all()


def test_dense_matches_dequantized_matmul():
    """dense(x, qt) == x @ (q * scale) up to the platform's bf16-class
    default matmul precision (the exact product is computed in numpy)."""
    rng = np.random.default_rng(1)
    xn = rng.standard_normal((4, 64)).astype(np.float32)
    wn = rng.standard_normal((64, 32)).astype(np.float32)
    qt = quantize_int8(jnp.asarray(wn))
    y_q = np.asarray(dense(jnp.asarray(xn), qt), np.float64)
    y_ref = xn.astype(np.float64) @ (
        np.asarray(qt.q, np.float64) * np.asarray(qt.scale, np.float64))
    scale = np.abs(y_ref).max() + 1e-6
    assert np.abs(y_q - y_ref).max() / scale < 2e-2


def test_quantize_pytree_policy():
    params = {
        "layers": [{
            "wqkv": jnp.ones((512, 512)),          # eligible
            "q_norm": jnp.ones((64,)),             # 1-D: skipped
            "conv_w": jnp.ones((3, 1, 512)),       # key not listed: skipped
        }],
        "lm_head": jnp.ones((512, 1024)),          # eligible
        "embed": jnp.ones((1024, 512)),            # key not listed: skipped
    }
    q = quantize_pytree(params, min_size=1024)
    assert isinstance(q["layers"][0]["wqkv"], QTensor)
    assert isinstance(q["lm_head"], QTensor)
    assert not isinstance(q["layers"][0]["conv_w"], QTensor)
    assert not isinstance(q["embed"], QTensor)


def test_quantized_kani_decode():
    """The int8 path must run through the jitted decode loop and produce
    logits close to the float path."""
    from tts_tpu.models.kani import (
        KaniConfig, embed_tokens, init_params, init_state, kani_step)

    cfg = KaniConfig(
        hidden_size=32, num_heads=2, num_kv_heads=1, head_dim=16, ffn_dim=64,
        vocab_size=128, layer_types=("conv", "attn"), max_seq_len=32,
        stop_token=127,
    )
    params = init_params(cfg, jax.random.key(0))
    qparams = quantize_pytree(params, min_size=256)
    ids = jnp.asarray([[3, 9, 27]], jnp.int32)

    def logits_of(p):
        state = init_state(cfg, kv_dtype=jnp.float32)
        lg, _ = jax.jit(lambda p, h, s: kani_step(p, h, s, cfg))(
            p, embed_tokens(p, ids), state)
        return np.asarray(lg)

    lf = logits_of(params)
    lq = logits_of(qparams)
    # int8 quantization noise is small relative to the logit scale
    denom = np.abs(lf).max() + 1e-6
    assert np.abs(lf - lq).max() / denom < 0.1


def test_int4_roundtrip_and_dense():
    from tts_tpu.quant.weight_only import (
        QTensor4, QTensorG, _unpack_int4, dense, quantize_int4,
        quantize_pytree)

    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    # search=False: plain RTN, whose per-element error bound is exact
    # (the default k_quant-style search trades bounded per-element error
    # for lower MSE — tests/test_int4_bound.py covers it)
    qt = quantize_int4(w, 32, search=False)
    assert qt.q.shape == (32, 32)
    deq = np.asarray(_unpack_int4(qt))
    amax = np.abs(np.asarray(w)).reshape(2, 32, 32).max(1)
    bound = np.repeat(amax / 7.0 * 0.51, 32, axis=0) + 1e-6
    assert (np.abs(deq - np.asarray(w)) <= bound).all()
    # pytree pass with bits=4 quantizes eligible 2-D weights into the
    # RUNTIME form (int8-container values + post-dot group scales — the
    # packed nibbles stream 4 bytes/param through decode loops otherwise:
    # XLA can't keep the unpack fused at model sizes, measured 98 vs
    # 1128 tok/s on Kani); the packed QTensor4 stays the artifact format
    params = {"lm_head": jnp.ones((512, 1024))}
    q = quantize_pytree(params, min_size=1024, bits=4)
    assert isinstance(q["lm_head"], QTensorG)
    # runtime <-> storage round trip is lossless
    rt = q["lm_head"]
    np.testing.assert_array_equal(np.asarray(rt.pack().unpack_runtime().q),
                                  np.asarray(rt.q))
    # dense on runtime form == dense on dequantized weights
    x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    qt4 = quantize_int4(w, 32)
    ref = jnp.matmul(x, _unpack_int4(qt4))
    out = dense(x, qt4.unpack_runtime())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_f5_pipeline_quantized_smoke():
    """The Q8 F5 path must synthesize deterministically through the jitted
    scan (the reference's Q8F32 release analog)."""
    from tests.test_f5 import TINY
    from tts_tpu.models.f5 import init_params as f5_init
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    vcfg = VocosConfig(input_channels=TINY.n_mels, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=TINY.n_fft, hop=TINY.hop,
                       sample_rate=TINY.sample_rate)
    vocab = {c: i for i, c in enumerate("abcdefghij ")}
    pipe = F5Pipeline(f5_init(TINY, jax.random.key(0)), TINY, vocab,
                      vocos_init(vcfg, jax.random.key(1)), vcfg, quantize=8)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2000) * 3000).astype(np.int16)
    wav, stats = pipe.synthesize(audio, "abc def", "hij abc", seed=7)
    wav2, _ = pipe.synthesize(audio, "abc def", "hij abc", seed=7)
    assert wav.dtype == np.int16 and len(wav) > 0
    np.testing.assert_array_equal(wav, wav2)


def test_quantized_matmul_kernel_matches_dequant():
    """Pallas int8 kernel (interpret mode) vs explicit quantize->matmul."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from tts_tpu.ops.quant_matmul import quantized_matmul
    from tts_tpu.quant.weight_only import quantize_int8

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((256, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 256)) * 0.1, jnp.float32)
    qt = quantize_int8(w)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(quantized_matmul(x, qt.q, qt.scale,
                                          block_m=128, block_n=256))

    # reference: same per-row activation quant in numpy, fp64 accum
    xn = np.asarray(x, np.float64)
    xs = np.maximum(np.abs(xn).max(1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.round(xn / xs), -127, 127)
    ref = (xq @ np.asarray(qt.q, np.float64)) * xs * np.asarray(qt.scale)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
