"""Parity tests of the shared nn layer vs independent torch references."""
import numpy as np
import torch

from tts_tpu.nn import (
    apply_rope,
    apply_rope_interleaved,
    attention_mask,
    gqa_attention,
    rms_norm,
    rope_table,
    rope_table_interleaved,
    swiglu,
)


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 64)).astype(np.float32)
    w = rng.standard_normal(64).astype(np.float32)
    t = torch.from_numpy(x)
    ref = t * torch.rsqrt(t.pow(2).mean(-1, keepdim=True) + 1e-5) * torch.from_numpy(w)
    out = np.asarray(rms_norm(x, w, 1e-5))
    assert np.abs(out - ref.numpy()).max() < 1e-5


def test_rope_half_split_matches_torch():
    """Standard Llama-style rotate_half RoPE."""
    d, s, h = 64, 7, 4
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, s, h, d)).astype(np.float32)
    cos_t, sin_t = rope_table(32, d)

    xt = torch.from_numpy(x)
    cos = torch.from_numpy(cos_t[:s].copy())[None, :, None, :]
    sin = torch.from_numpy(sin_t[:s].copy())[None, :, None, :]
    x1, x2 = xt.chunk(2, dim=-1)
    rot = torch.cat([-x2, x1], dim=-1)
    ref = xt * cos + rot * sin

    out = np.asarray(apply_rope(x, cos_t[:s], sin_t[:s]))
    assert np.abs(out - ref.numpy()).max() < 1e-5


def test_rope_interleaved_matches_complex_mult():
    """Interleaved RoPE == complex rotation on (even, odd) pairs."""
    d, s = 8, 5
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, s, 1, d)).astype(np.float32)
    cos_t, sin_t = rope_table_interleaved(16, d)
    out = np.asarray(apply_rope_interleaved(x, cos_t[:s], sin_t[:s]))

    # complex reference
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = np.outer(np.arange(s), inv)
    z = x[0, :, 0, 0::2] + 1j * x[0, :, 0, 1::2]
    zr = z * np.exp(1j * ang)
    ref = np.empty((s, d), np.float32)
    ref[:, 0::2] = zr.real
    ref[:, 1::2] = zr.imag
    assert np.abs(out[0, :, 0] - ref).max() < 1e-5


def _torch_gqa(q, k, v, mask, scale):
    """Naive GQA reference with repeat_kv."""
    b, s, h, d = q.shape
    kvh = k.shape[1]
    g = h // kvh
    q_t = torch.from_numpy(q).permute(0, 2, 1, 3)           # (B, H, S, D)
    k_t = torch.from_numpy(k).repeat_interleave(g, dim=1)    # (B, H, T, D)
    v_t = torch.from_numpy(v).repeat_interleave(g, dim=1)
    scores = q_t @ k_t.transpose(-1, -2) * scale
    scores = scores.masked_fill(~torch.from_numpy(np.asarray(mask))[None, None], -1e30)
    probs = torch.softmax(scores, dim=-1)
    return (probs @ v_t).permute(0, 2, 1, 3).numpy()


def test_gqa_attention_matches_naive_repeat_kv():
    b, s, t, h, kvh, d = 2, 4, 9, 8, 2, 32
    rng = np.random.default_rng(3)
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, kvh, t, d)).astype(np.float32)
    v = rng.standard_normal((b, kvh, t, d)).astype(np.float32)
    # query block starts at kv position 5, kv_len = 9
    mask = np.asarray(attention_mask(s, t, 5, 9, causal=True))
    out = np.asarray(gqa_attention(q, k, v, mask, scale=d**-0.5))
    ref = _torch_gqa(q, k, v, mask, d**-0.5)
    assert np.abs(out - ref).max() < 2e-4


def test_attention_mask_semantics():
    m = np.asarray(attention_mask(2, 6, 3, 5, causal=True))
    # query 0 at pos 3: attends kv 0..3; query 1 at pos 4: 0..4; kv_len=5 caps
    assert m.tolist() == [
        [True, True, True, True, False, False],
        [True, True, True, True, True, False],
    ]


def test_swiglu_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 16)).astype(np.float32)
    wg = rng.standard_normal((16, 32)).astype(np.float32)
    wu = rng.standard_normal((16, 32)).astype(np.float32)
    wd = rng.standard_normal((32, 16)).astype(np.float32)
    out = np.asarray(swiglu(x, np.concatenate([wg, wu], 1), wd))
    t = torch.from_numpy
    ref = (torch.nn.functional.silu(t(x) @ t(wg)) * (t(x) @ t(wu))) @ t(wd)
    assert np.abs(out - ref.numpy()).max() < 2e-4
