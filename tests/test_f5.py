"""F5-TTS model family: component golden tests vs the upstream math (torch
on CPU re-deriving the published formulas), masking semantics, and an
end-to-end tiny-pipeline smoke test.

Mirrors the reference's verification style (SURVEY.md §4): numeric diffs per
kernel plus an export-then-run smoke pass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tts_tpu.models.f5 import (
    F5Config,
    _grn,
    _text_freqs_cis,
    dit_forward,
    f5_time_embed_table,
    f5_time_schedule,
    init_params,
    text_embedding,
)

TINY = F5Config(
    dim=64, depth=2, heads=2, head_dim=32, ff_mult=2,
    text_dim=32, conv_layers=1, conv_mult=2, n_mels=8, vocab_size=20,
    nfe_steps=4, n_fft=256, hop=64, win_length=256, max_signal_len=128,
    freq_embed_dim=16,
)


def test_time_schedule_matches_torch_formula():
    import torch

    nfe, sway = 32, -1.0
    t = torch.linspace(0, 1, nfe, dtype=torch.float32)
    ts_t = t + sway * (torch.cos(torch.pi * 0.5 * t) - 1 + t)
    ts, dts = f5_time_schedule(nfe, sway)
    np.testing.assert_allclose(ts, ts_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(dts, torch.diff(ts_t).numpy(), atol=1e-6)


def test_time_embed_table_matches_torch_mlp():
    """Reference precompute: Export_F5.py:163-170 — sinus embedding at
    t*1000 through the 2-layer silu MLP."""
    import math

    import torch

    rng = np.random.default_rng(0)
    freq_dim, dim = 16, 24
    w1 = rng.standard_normal((freq_dim, dim)).astype(np.float32)
    b1 = rng.standard_normal(dim).astype(np.float32)
    w2 = rng.standard_normal((dim, dim)).astype(np.float32)
    b2 = rng.standard_normal(dim).astype(np.float32)
    ts, _ = f5_time_schedule(8, -1.0)
    table = f5_time_embed_table(ts, w1, b1, w2, b2, freq_dim)

    half = freq_dim // 2
    emb_factor = math.log(10000) / (half - 1)
    emb_factor = 1000.0 * torch.exp(torch.arange(half).float() * -emb_factor)
    rows = []
    mlp = torch.nn.Sequential(
        torch.nn.Linear(freq_dim, dim), torch.nn.SiLU(), torch.nn.Linear(dim, dim)
    )
    with torch.no_grad():
        mlp[0].weight.copy_(torch.from_numpy(w1.T))
        mlp[0].bias.copy_(torch.from_numpy(b1))
        mlp[2].weight.copy_(torch.from_numpy(w2.T))
        mlp[2].bias.copy_(torch.from_numpy(b2))
        for t in ts:
            emb = torch.tensor(float(t)) * emb_factor
            emb = torch.cat((emb.sin(), emb.cos()), dim=-1)
            rows.append(mlp(emb).numpy())
    np.testing.assert_allclose(table, np.stack(rows), atol=2e-4)


def test_grn_matches_torch_formula():
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 12, 6)).astype(np.float32)
    gamma = rng.standard_normal((1, 1, 6)).astype(np.float32)
    beta = rng.standard_normal((1, 1, 6)).astype(np.float32)
    out = np.asarray(_grn(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))

    xt = torch.from_numpy(x)
    gx = torch.norm(xt, p=2, dim=1, keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    ref = torch.from_numpy(gamma) * (xt * nx) + torch.from_numpy(beta) + xt
    np.testing.assert_allclose(out, ref.numpy(), atol=1e-5)


def test_text_freqs_cis_matches_torch():
    """precompute_freqs_cis parity (modules.py:196-206)."""
    import torch

    dim, end = 16, 32
    freqs = 1.0 / (10000.0 ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    t = torch.arange(end)
    fr = torch.outer(t, freqs).float()
    ref = torch.cat([fr.cos(), fr.sin()], dim=-1).numpy()
    np.testing.assert_allclose(_text_freqs_cis(dim, end), ref, atol=1e-6)


def test_text_embedding_mask_and_shapes():
    params = init_params(TINY, jax.random.key(0))
    ids = jnp.asarray([[3, 5, 2]], jnp.int32)
    text, drop = text_embedding(params, ids, 16, TINY)
    assert text.shape == (1, 16, TINY.text_dim)
    assert drop.shape == (1, 16, TINY.text_dim)
    # filler positions (>= len) are hard-zeroed in the cond row
    np.testing.assert_array_equal(np.asarray(text[0, 3:]), 0.0)
    # drop row is NOT masked at real-token positions and differs from cond
    assert np.abs(np.asarray(text[0, :3] - drop[0, :3])).max() > 0


def test_text_embedding_pad_id_equivalence():
    """Padding with -1 (maps to filler 0 after the +1 shift) must equal
    explicit shorter input — the bucket-padding contract of runtime/f5.py."""
    params = init_params(TINY, jax.random.key(0))
    a, _ = text_embedding(params, jnp.asarray([[3, 5, 2]], jnp.int32), 16, TINY)
    b, _ = text_embedding(
        params, jnp.asarray([[3, 5, 2, -1, -1]], jnp.int32), 16, TINY
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dit_forward_cfg_pair():
    params = init_params(TINY, jax.random.key(1))
    t = 24
    noise = jax.random.normal(jax.random.key(2), (1, t, TINY.n_mels))
    cond = jax.random.normal(jax.random.key(3), (1, t, TINY.n_mels + TINY.text_dim))
    cond_drop = jnp.zeros_like(cond)
    pred, pred1 = jax.jit(
        lambda n, c, cd: dit_forward(
            params, n, c, cd, params["time_table"][0],
            params["rope_cos"][:t], params["rope_sin"][:t], TINY,
        )
    )(noise, cond, cond_drop)
    assert pred.shape == (1, t, TINY.n_mels)
    assert pred1.shape == (1, t, TINY.n_mels)
    assert np.isfinite(np.asarray(pred)).all()
    # cond and uncond rows must differ (different conditioning)
    assert np.abs(np.asarray(pred - pred1)).max() > 1e-6


def test_dit_kv_mask_locality():
    """With kv_mask cutting at L, outputs at positions < L must not depend on
    content beyond L (the static-bucket masking contract)."""
    params = init_params(TINY, jax.random.key(4))
    t, cut = 32, 20
    noise = np.asarray(jax.random.normal(jax.random.key(5), (1, t, TINY.n_mels)))
    cond = np.asarray(
        jax.random.normal(jax.random.key(6), (1, t, TINY.n_mels + TINY.text_dim))
    )
    def run(nz, cd):
        # zero the invalid region like the pipeline does before the convs
        m = (jnp.arange(t) < cut)[None, :, None]
        return dit_forward(
            params, jnp.asarray(nz) * m, jnp.asarray(cd) * m,
            jnp.zeros_like(jnp.asarray(cd)), params["time_table"][0],
            params["rope_cos"][:t], params["rope_sin"][:t], TINY,
            kv_len=jnp.int32(cut),
        )[0]

    base = np.asarray(run(noise, cond))
    noise2 = noise.copy()
    noise2[:, cut:] = 123.0
    cond2 = cond.copy()
    cond2[:, cut:] = -7.0
    pert = np.asarray(run(noise2, cond2))
    np.testing.assert_allclose(base[:, :cut], pert[:, :cut], atol=1e-5)


def test_f5_pipeline_smoke():
    """Tiny end-to-end synthesize: deterministic, finite int16 audio."""
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    vocab = {c: i for i, c in enumerate("abcdefghij ")}
    cfg = TINY
    vcfg = VocosConfig(input_channels=cfg.n_mels, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=cfg.n_fft, hop=cfg.hop,
                       sample_rate=cfg.sample_rate)
    pipe = F5Pipeline(
        init_params(cfg, jax.random.key(0)), cfg, vocab,
        vocos_init(vcfg, jax.random.key(1)), vcfg,
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2000) * 3000).astype(np.int16)
    wav1, stats = pipe.synthesize(audio, "abc def", "hij abc", seed=7)
    wav2, _ = pipe.synthesize(audio, "abc def", "hij abc", seed=7)
    assert wav1.dtype == np.int16
    assert len(wav1) > 0
    np.testing.assert_array_equal(wav1, wav2)
    assert stats.rtf > 0


def test_vocos_decode_shapes():
    from tts_tpu.models.vocos import VocosConfig, init_params as vocos_init, vocos_decode

    vcfg = VocosConfig(input_channels=8, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=256, hop=64)
    params = vocos_init(vcfg, jax.random.key(0))
    mel = jax.random.normal(jax.random.key(1), (1, 20, 8))
    wav = jax.jit(lambda m: vocos_decode(params, m, vcfg))(mel)
    assert wav.shape == (1, 19 * 64)
    assert np.isfinite(np.asarray(wav)).all()


def test_f5_pipeline_layer_cache():
    """FORA-style layer caching (layer_cache_interval=2): the pipeline runs,
    output is finite deterministic int16, and the first (full-compute) Euler
    step math is shared with the exact path — on a 4-step schedule with K=2
    the output stays close to exact."""
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    vocab = {c: i for i, c in enumerate("abcdefghij ")}
    cfg = TINY
    vcfg = VocosConfig(input_channels=cfg.n_mels, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=cfg.n_fft, hop=cfg.hop,
                       sample_rate=cfg.sample_rate)
    params = init_params(cfg, jax.random.key(0))
    vparams = vocos_init(vcfg, jax.random.key(1))
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2000) * 3000).astype(np.int16)

    exact = F5Pipeline(params, cfg, vocab, vparams, vcfg)
    wav_exact, _ = exact.synthesize(audio, "abc def", "hij abc", seed=7)

    cached = F5Pipeline(params, cfg, vocab, vparams, vcfg,
                        layer_cache_interval=2)
    wav1, _ = cached.synthesize(audio, "abc def", "hij abc", seed=7)
    wav2, _ = cached.synthesize(audio, "abc def", "hij abc", seed=7)
    np.testing.assert_array_equal(wav1, wav2)
    assert wav1.dtype == np.int16 and len(wav1) == len(wav_exact)
    # approximation, not equality — but the waveforms must be correlated
    a = wav1.astype(np.float64)
    b = wav_exact.astype(np.float64)
    corr = (a * b).sum() / max(np.sqrt((a * a).sum() * (b * b).sum()), 1e-9)
    assert corr > 0.5, corr


def test_f5_batched_serving_matches_single_at_b1():
    """synthesize_batch with one request is bit-identical to synthesize
    (same buckets, same PRNG key, same masking); B=2 mixed-length requests
    produce per-request finite outputs of the single-path lengths."""
    from tts_tpu.models.vocos import VocosConfig
    from tts_tpu.models.vocos import init_params as vocos_init
    from tts_tpu.runtime.f5 import F5Pipeline

    vocab = {c: i for i, c in enumerate("abcdefghij ")}
    cfg = TINY
    vcfg = VocosConfig(input_channels=cfg.n_mels, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=cfg.n_fft, hop=cfg.hop,
                       sample_rate=cfg.sample_rate)
    pipe = F5Pipeline(
        init_params(cfg, jax.random.key(0)), cfg, vocab,
        vocos_init(vcfg, jax.random.key(1)), vcfg,
    )
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(2000) * 3000).astype(np.int16)

    single, _ = pipe.synthesize(audio, "abc def", "hij abc", seed=7)
    batch1, _ = pipe.synthesize_batch([(audio, "abc def", "hij abc")], seed=7)
    np.testing.assert_array_equal(single, batch1[0])

    audio2 = (rng.standard_normal(3000) * 3000).astype(np.int16)
    reqs = [(audio, "abc def", "hij abc"),
            (audio2, "abcd", "hij abc def ab")]
    outs, stats = pipe.synthesize_batch(reqs, seed=3)
    assert len(outs) == 2
    for (ra, rt, gt), o in zip(reqs, outs):
        exp, _ = pipe.synthesize(ra, rt, gt)
        assert len(o) == len(exp)
        assert o.dtype == np.int16
        assert np.isfinite(o.astype(np.float32)).all()
    assert stats.audio_s > 0 and stats.wall_s > 0
