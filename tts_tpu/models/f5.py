"""F5-TTS flow-matching DiT — TPU-native (jit + lax.scan) re-design.

Behavioral contract from the reference export wrappers
(/root/reference/F5_TTS/Export_F5.py:98-203) and the patched model
(/root/reference/F5_TTS/modeling_modified/F5/dit.py:32-220, modules.py:149-698):

  * preprocess: int16 audio -> log-mel (htk fbank, clamp 1e-5), pad to
    max_duration, draw gaussian noise, embed text (char ids +1, 0 = filler)
    through an embedding + sinus position table + ConvNeXtV2 stack, computed
    twice (cond and drop/uncond rows share the conv stack with all-filler
    input for the drop row);
  * transformer: 22 DiT blocks with AdaLN-zero modulation from a precomputed
    per-NFE-step time-embedding table, interleaved-pair RoPE, CFG via the
    batch-2 trick (cond row 0, uncond row 1), Euler update
    noise += (pred + (pred - pred1) * cfg) * delta_t[t] on a sway-sampled
    schedule (Export_F5.py:153-182);
  * decode: slice off the reference frames and vocode (models/vocos.py).

TPU re-design decisions (not a port):
  * the reference splits this into 3 ONNX graphs + a Python NFE loop with
    per-step session calls; here preprocess/transformer/decode are pure
    functions and the NFE loop is one `lax.scan` — zero host round-trips;
  * RoPE tables are sliced inside the jitted program (the exported
    rope_cos_q/k graph outputs disappear);
  * attention uses one fused QKV matmul; the d^-0.25 pre-scale is folded
    into the Q and K weights at load time (weights/f5_loader.py), matching
    the reference's export-time fold (Export_F5.py:329-333);
  * everything is feature-last (B, T, C) so channels ride MXU lanes.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..audio.mel import MelSpectrogram
from ..nn.norm import layer_norm
from ..nn.rope import rope_table_interleaved
from ..ops.conv import conv1d
from ..quant.weight_only import QTensor, dense

__all__ = [
    "F5Config",
    "f5_time_schedule",
    "f5_time_embed_table",
    "f5_rope_tables",
    "attach_mod_tables",
    "hs_perm",
    "text_embedding",
    "input_embedding",
    "dit_forward",
    "f5_preprocess",
    "f5_denoise",
    "init_params",
]


@dataclass(frozen=True)
class F5Config:
    """Defaults = F5TTS_v1_Base (SWivid/F5-TTS), the reference's target
    checkpoint (Export_F5.py:21, configs/F5TTS_v1_Base.yaml)."""

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    head_dim: int = 64
    ff_mult: int = 2
    text_dim: int = 512
    conv_layers: int = 4
    conv_mult: int = 2
    n_mels: int = 100
    vocab_size: int = 2545          # len(vocab.txt); +1 filler row in the table
    nfe_steps: int = 32
    cfg_strength: float = 2.0
    sway_coef: float = -1.0
    sample_rate: int = 24000
    n_fft: int = 1024
    hop: int = 256
    win_length: int = 1024
    max_signal_len: int = 4096
    freq_embed_dim: int = 256
    # kv-chunking of the flat flash kernel (independent exp2 per
    # 128-aligned chunk -> Mosaic can overlap chunk c+1's score dot with
    # chunk c's exp2 tail; benchmarks/flash_ablation.py kvsplitN).
    # Changes only fp32 denominator/PV reassociation (same accuracy vs
    # the fp32 reference); 1 = off.
    attn_kv_split: int = 1

    @property
    def inner_dim(self) -> int:
        return self.heads * self.head_dim


# --------------------------------------------------------------------------
# Precomputed schedules (host numpy — become jit constants)

def f5_time_schedule(nfe_steps: int, sway_coef: float) -> tuple[np.ndarray, np.ndarray]:
    """Sway-sampled t-span and per-step deltas (Export_F5.py:160-162).

    Returns (t (nfe,), delta_t (nfe-1,))."""
    t = np.linspace(0.0, 1.0, nfe_steps, dtype=np.float64)
    ts = t + sway_coef * (np.cos(np.pi * 0.5 * t) - 1.0 + t)
    return ts.astype(np.float32), np.diff(ts).astype(np.float32)


def f5_time_embed_table(
    ts: np.ndarray, mlp_w1: np.ndarray, mlp_b1: np.ndarray,
    mlp_w2: np.ndarray, mlp_b2: np.ndarray, freq_embed_dim: int = 256,
) -> np.ndarray:
    """Precompute time_mlp outputs for every NFE step (Export_F5.py:163-170).

    mlp weights in (in, out) layout. Returns (nfe, dim) float32."""
    half = freq_embed_dim // 2
    emb_factor = math.log(10000) / (half - 1)
    emb_factor = 1000.0 * np.exp(np.arange(half, dtype=np.float64) * -emb_factor)
    emb = ts.astype(np.float64)[:, None] * emb_factor[None, :]
    emb = np.concatenate([np.sin(emb), np.cos(emb)], axis=-1)       # (nfe, 256)
    h = emb @ mlp_w1 + mlp_b1
    h = h / (1.0 + np.exp(-h))                                      # silu
    return (h @ mlp_w2 + mlp_b2).astype(np.float32)                 # (nfe, dim)


# --------------------------------------------------------------------------
# Half-split RoPE layout + precomputed AdaLN tables (perf folds)

def hs_perm(head_dim: int) -> np.ndarray:
    """Permutation turning interleaved-pair RoPE into half-split form.

    The F5 checkpoint uses interleaved pairs (2i, 2i+1) (Export_F5.py:108-110).
    Permuting each head's q/k feature columns to [evens | odds] at LOAD time
    makes the rotation a rotate-half (two 32-lane slices — cheap on the VPU)
    instead of a pairwise interleave shuffle, measured 1.4 ms/step faster on
    the DiT at T=1408. Scores q·k are invariant under any shared permutation,
    so the model output is bit-equivalent up to float summation order."""
    return np.concatenate([np.arange(0, head_dim, 2),
                           np.arange(1, head_dim, 2)])


def f5_rope_tables(max_len: int, head_dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Interleaved-pair rope tables re-laid-out for the half-split perm."""
    cos, sin = rope_table_interleaved(max_len, head_dim)
    p = hs_perm(head_dim)
    return cos[:, p], sin[:, p]


def _rot_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope_hs(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, T, H, D); cos/sin: (T, D) half-split tables."""
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    return x * cos + _rot_half(x) * sin


def attach_mod_tables(params, cfg: F5Config):
    """Precompute every AdaLN modulation vector: the time embedding takes only
    nfe_steps distinct values, so silu(t_emb) @ W_ada per block is a pure
    function of the step index. Folding it into (nfe, depth, 6*dim) /
    (nfe, 2*dim) tables removes 22 latency-bound M=1 matmuls and ~280 MB of
    weight reads per Euler step (the §2.8.7 constant-folding playbook applied
    one level deeper than the reference's time-MLP table)."""
    silu_t = jax.nn.silu(params["time_table"].astype(jnp.float32))
    dt = params["proj_out"]["w"].dtype
    ada = jnp.stack(
        [silu_t @ b["ada"]["w"].astype(jnp.float32)
         + b["ada"]["b"].astype(jnp.float32) for b in params["blocks"]],
        axis=1,
    )                                                   # (nfe, depth, 6*dim)
    nout = silu_t @ params["norm_out"]["w"].astype(jnp.float32) \
        + params["norm_out"]["b"].astype(jnp.float32)   # (nfe, 2*dim)
    params["ada_table"] = ada.astype(dt)
    params["norm_out_table"] = nout.astype(dt)
    return params


# --------------------------------------------------------------------------
# Text embedding (reference dit.py:31-75)

def _grn(x: jax.Array, gamma: jax.Array, beta: jax.Array) -> jax.Array:
    """Global response norm over the sequence axis (modules.py:217-229)."""
    gx = jnp.sqrt(jnp.sum(x * x, axis=1, keepdims=True))            # (B, 1, D)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    return gamma * (x * nx) + beta + x


def _convnext_v2_block(x: jax.Array, p) -> jax.Array:
    """dwconv(7) -> LN -> pw1 -> GELU -> GRN -> pw2, residual
    (modules.py:233-262). conv1d auto-dispatches the depthwise stride-1
    conv to its shifted-FMA fast path (grouped-conv lowering is a TPU
    layout hazard)."""
    r = x
    x = conv1d(x, p["dwconv"]["w"], p["dwconv"]["b"], padding=3,
               groups=x.shape[-1])
    x = layer_norm(x, p["norm"]["w"], p["norm"]["b"], eps=1e-6)
    x = jnp.matmul(x, p["pw1"]["w"]) + p["pw1"]["b"]
    x = jax.nn.gelu(x, approximate=False)
    x = _grn(x, p["grn"]["gamma"], p["grn"]["beta"])
    x = jnp.matmul(x, p["pw2"]["w"]) + p["pw2"]["b"]
    return r + x


def text_embedding(params, text_ids: jax.Array, seq_len: int, cfg: F5Config):
    """(1, T_text) raw char ids (-1 pad BEFORE the +1 shift applied here) ->
    (text, text_drop), each (1, seq_len, text_dim).

    Matches the reference contract (Export_F5.py:137: ids+1, zero-padded to
    max_duration; dit.py:49-73: drop row = filler-id embedding through the
    same conv stack, both masked at filler positions).
    """
    p = params["text_embed"]
    ids = jnp.pad(text_ids + 1, ((0, 0), (0, seq_len - text_ids.shape[1])))
    mask = (ids == 0)[..., None]                                    # (1, T, 1)

    emb = p["embed"][ids]                                           # (1, T, D)
    drop = jnp.broadcast_to(p["embed"][0], emb.shape)

    pos = params["text_freqs_cis"][:seq_len][None]                  # (1, T, D)
    emb = jnp.where(mask, 0.0, emb + pos)
    # the drop row is ALSO masked at filler positions before the first conv
    # block (dit.py:69) — the 7-wide dwconv bleeds filler columns into the
    # last valid positions otherwise (caught by the DiT reference-code
    # oracle, tests/test_reference_oracle_f5.py)
    drop = jnp.where(mask, 0.0, drop + pos)
    # cond and drop rows ride one batch-2B pass through the conv stack — the
    # blocks are batch-parallel, so this is exactly the two-call result at
    # half the cost
    z = jnp.concatenate([emb, drop], axis=0)                        # (2B, T, D)
    mask2 = jnp.concatenate([mask, mask], axis=0)
    for blk in p["blocks"]:
        z = jnp.where(mask2, 0.0, _convnext_v2_block(z, blk))
    nb = emb.shape[0]
    return z[:nb], z[nb:]


def _text_freqs_cis(text_dim: int, max_pos: int = 4096) -> np.ndarray:
    """Sinus position table cat(cos, sin) (modules.py:196-206)."""
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, text_dim, 2, dtype=np.float64) / text_dim))
    freqs = np.outer(np.arange(max_pos, dtype=np.float64), inv_freq)
    return np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1).astype(np.float32)


# --------------------------------------------------------------------------
# Input embedding + DiT blocks

# Pallas-kernel toggles (module-level so A/B perf tests can flip them;
# production default True — gates additionally require TPU backend, float
# weights, and VMEM fit at the call sites)
USE_FUSED_CONV = True
USE_FUSED_MLP = True
USE_FUSED_Q8 = True
# Tests only: route the W8A8 kernels on CPU in Pallas interpret mode so the
# activation-quantization math of the TPU path can be bounded end-to-end
# without a chip (tests/test_w8a8_bound.py). Attention runs a plain-jnp
# softmax in this mode (the flash kernel is TPU-only; it is a
# reassociation, not a numerics change).
Q8_INTERPRET = False


def _is_q8(w) -> bool:
    """Per-channel int8 QTensor (not the packed int4 QTensor4)."""
    return isinstance(w, QTensor)


def _grouped_conv_mm(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """'same'-padded grouped conv1d as a batched im2col matmul.

    XLA's grouped conv at these shapes (31-tap, 1024 ch, 16 groups) is a
    layout hazard on TPU — depending on surrounding HLO it compiles to either
    a fast or a ~15 ms/step-slower form. The im2col dot is shape-stable,
    numerically identical, and rides the MXU: (g, B*T, K*cin_pg) @
    (g, K*cin_pg, cout_pg)."""
    K, cin_pg, cout = w.shape
    B, T, C = x.shape
    g = C // cin_pg
    cout_pg = cout // g
    pad_l = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad_l, K - 1 - pad_l), (0, 0)))
    xp = xp.reshape(B, T + K - 1, g, cin_pg)
    col = jnp.stack([xp[:, i:i + T] for i in range(K)], axis=3)
    col = col.transpose(2, 0, 1, 3, 4).reshape(g, B * T, K * cin_pg)
    wg = w.reshape(K, cin_pg, g, cout_pg).transpose(2, 0, 1, 3)
    wg = wg.reshape(g, K * cin_pg, cout_pg)
    out = jax.lax.dot_general(col, wg, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    out = out.reshape(g, B, T, cout_pg).transpose(1, 2, 0, 3)
    return out.reshape(B, T, cout).astype(x.dtype) + b


def input_embedding(params, x: jax.Array, cond: jax.Array) -> jax.Array:
    """cat(x, cond) -> proj -> conv-position-embed residual
    (dit.py:78-88, modules.py:167-189).

    On TPU the conv1 -> mish -> conv2 -> mish -> +residual chain runs as
    one Pallas kernel (ops/grouped_conv.py): grouped convs are group-local,
    so each (batch, group) program holds its whole channel slice in VMEM —
    the im2col path below re-reads ~356 MB of HBM per step, ~2 ms of the
    NFE step at T=1408."""
    p = params["input_embed"]
    h = jnp.concatenate([x, cond], axis=-1)
    h = jnp.matmul(h, p["proj"]["w"]) + p["proj"]["b"]
    k, cin_pg, c_out = p["conv1"]["w"].shape
    groups = c_out // cin_pg
    # VMEM bound: the kernel's column scratch is (K*cin_pg, T) — stay on
    # the im2col path when it would not fit (fp32 params at long T)
    col_bytes = k * cin_pg * h.shape[1] * h.dtype.itemsize
    if (USE_FUSED_CONV and jax.default_backend() == "tpu"
            and h.shape[1] % 8 == 0 and col_bytes <= 7 * 2 ** 20):
        from ..ops.grouped_conv import conv_pos_embed_fused

        return conv_pos_embed_fused(
            h, p["conv1"]["w"], p["conv1"]["b"],
            p["conv2"]["w"], p["conv2"]["b"], groups=groups)
    c = _grouped_conv_mm(h, p["conv1"]["w"], p["conv1"]["b"])
    c = c * jnp.tanh(jax.nn.softplus(c))                            # mish
    c = _grouped_conv_mm(c, p["conv2"]["w"], p["conv2"]["b"])
    c = c * jnp.tanh(jax.nn.softplus(c))
    return c + h


def _rope_qkv_flat(qkv: jax.Array, rope_cos: jax.Array, rope_sin: jax.Array,
                   heads: int, head_dim: int):
    """Flat rope over the whole (B, T, 3*H*D) qkv tensor: the half-split
    rotate is two global rolls by D/2 + a per-lane sign/branch mask
    (within-head correctness: both branches stay inside their own head
    block; the circular wrap lands on discarded branches). cos/sin tile
    across the q and k heads and are 1/0 over the v columns, so one fused
    multiply-add ropes q and k and passes v through exactly. Replaces 3
    per-head rope chains and 3 (B,T,H,D)->(B,H,T,D) transposes with 2
    rolls + 1 transpose; element math identical to _apply_rope_hs (fp32
    ops, same final cast). Returns q, k, v in (B, H, T, D)."""
    b, t, _ = qkv.shape
    hd, half = head_dim, head_dim // 2
    cosf = rope_cos.astype(jnp.float32)
    sinf = rope_sin.astype(jnp.float32)
    cos3 = jnp.concatenate(
        [jnp.tile(cosf, (1, 2 * heads)),
         jnp.ones((t, heads * hd), jnp.float32)], axis=-1)
    sin3 = jnp.concatenate(
        [jnp.tile(sinf, (1, 2 * heads)),
         jnp.zeros((t, heads * hd), jnp.float32)], axis=-1)
    first_half = (np.arange(3 * heads * hd) % hd) < half
    rot = jnp.where(first_half, -jnp.roll(qkv, -half, axis=-1),
                    jnp.roll(qkv, half, axis=-1))
    roped = (qkv.astype(jnp.float32) * cos3
             + rot.astype(jnp.float32) * sin3).astype(qkv.dtype)
    qkvh = roped.reshape(b, t, 3 * heads, hd).transpose(0, 2, 1, 3)
    return (qkvh[:, :heads], qkvh[:, heads:2 * heads], qkvh[:, 2 * heads:])


def _plain_packed(q: jax.Array, k: jax.Array, v: jax.Array, kv_len
                  ) -> jax.Array:
    """Plain-jnp packed attention (Q8_INTERPRET CPU path): same math as
    the flash kernel (scale pre-folded into weights, keys >= kv_len
    masked), different summation association only."""
    b, h, t, d = q.shape
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
    if kv_len is not None:
        mask = jnp.arange(t)[None, None, None, :] < jnp.reshape(
            jnp.asarray(kv_len), (-1, 1, 1, 1))
        scores = jnp.where(mask, scores, -jnp.inf)
    w = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
    return o.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _flash_packed(q: jax.Array, k: jax.Array, v: jax.Array, kv_len,
                  head_dim: int) -> jax.Array:
    """Single-pass flash attention returning the packed (B, T, H*D) layout.
    Picks the largest divisor-of-t q-block (multiple of 8) whose fp32 score
    tile (hb, bq, t) plus the double-buffered k/v stream fits ~14 MB of
    VMEM — bigger q-blocks amortize the k/v residency (bq=704/hb=2 measured
    4% faster than 352/hb=2 at T=1408; outputs bit-identical, q-row
    blocking doesn't change any summation order)."""
    from ..ops.flash_attention import flash_attention

    _, heads, t, _ = q.shape
    hb = 2 if heads % 2 == 0 else 1
    bq = 128
    kv_bytes = 2 * 2 * hb * t * head_dim * q.dtype.itemsize
    for cand in range(min(t, 1024), 127, -8):
        if t % cand == 0 and hb * cand * t * 4 + kv_bytes <= 14 << 20:
            bq = cand
            break
    return flash_attention(q, k, v, kv_len, block_q=bq, block_kv=t,
                           head_block=hb, packed_out=True)


def _dit_attention(p, x: jax.Array, rope_cos: jax.Array, rope_sin: jax.Array,
                   heads: int, head_dim: int,
                   kv_len: jax.Array | None = None,
                   kv_split: int = 1) -> jax.Array:
    """Full (non-causal) self-attention, RoPE on q and k, softmax in fp32.
    The d^-0.5 scale is pre-folded into Wq/Wk (d^-0.25 each) by the loader,
    mirroring Export_F5.py:329-333, and the q/k feature columns are permuted
    to the half-split RoPE layout (see hs_perm) — rope_cos/rope_sin must be
    the matching f5_rope_tables. kv_len (scalar) masks keys at positions
    >= kv_len so a static bucket emulates the reference's exact-length
    sequence.

    On TPU the score/softmax/value chain runs through the Pallas
    flash-attention kernel (ops/flash_attention.py) — the profile showed the
    materialized (B, H, S, S) fp32 scores dominating the DiT step."""
    b, t, _ = x.shape
    qkv = dense(x, p["wqkv"]) + p["bqkv"]

    use_flash = (jax.default_backend() == "tpu" and t % 128 == 0
                 and head_dim % 64 == 0)
    if (use_flash and t <= 4096 and 128 % head_dim == 0
            and heads % (128 // head_dim) == 0):
        # flat-qkv flash: q/k/v tiles read straight from the qkv matmul
        # output with RoPE applied in the kernel prologue — removes the
        # XLA rope pass + (B,T,3H,D)->(B,3H,T,D) relayout (a full qkv
        # read+write per DiT block, ~1.3 ms of the 22-block NFE step)
        from ..ops.flash_attention import flash_attention_flat

        out = flash_attention_flat(qkv, rope_cos, rope_sin, kv_len,
                                   heads=heads, kv_split=kv_split)
        return dense(out, p["wo"]) + p["bo"]
    if use_flash:
        q, k, v = _rope_qkv_flat(qkv, rope_cos, rope_sin, heads, head_dim)
    else:
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, heads, head_dim)
        k = k.reshape(b, t, heads, head_dim)
        v = v.reshape(b, t, heads, head_dim)
        q = _apply_rope_hs(q, rope_cos, rope_sin).astype(x.dtype)
        k = _apply_rope_hs(k, rope_cos, rope_sin).astype(x.dtype)

    if use_flash:
        # full-kv blocks at these lengths: the whole score row stays in
        # VMEM so the single-pass kernel applies (no online-softmax
        # scratch), with 2 heads batched per grid program — measured 35%
        # faster than the scratch-carry config at t=1024. (An in-kernel
        # RoPE variant was measured a net loss in round 1 — Mosaic's
        # fp32-only rotate — and removed; the flat-rope prologue above
        # covers it in XLA.) packed_out: the kernel writes (B, S, H*D)
        # directly — the head relayout happens per-tile in VMEM instead of
        # as a full-tensor transpose.
        if t <= 4096:
            out = _flash_packed(q, k, v, kv_len, head_dim
                                ).reshape(b, t, heads, head_dim)
        else:
            from ..ops.flash_attention import flash_attention

            out = flash_attention(
                q, k, v, kv_len, block_q=256, block_kv=512,
            ).transpose(0, 2, 1, 3)
    else:
        scores = jnp.einsum("bshd,bthd->bhst", q, k,
                            preferred_element_type=jnp.float32)
        if kv_len is not None:
            kvv = jnp.asarray(kv_len, jnp.int32).reshape(-1)   # scalar | (B,)
            valid = jnp.arange(t)[None, :] < kvv[:, None]
            scores = jnp.where(valid[:, None, None, :], scores,
                               jnp.float32(-1e30))
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhst,bthd->bshd", probs, v)
    out = out.reshape(b, t, heads * head_dim)
    return dense(out, p["wo"]) + p["bo"]


def _dit_block(p, x: jax.Array, t_emb: jax.Array, rope_cos, rope_sin,
               cfg: F5Config, kv_len=None, mod=None) -> jax.Array:
    """AdaLN-zero DiT block (modules.py:571-613). t_emb: (1, 1, dim); mod
    (1, 1, 6*dim) overrides the AdaLN matmul when precomputed (see
    attach_mod_tables)."""
    if mod is None:
        mod = jnp.matmul(jax.nn.silu(t_emb), p["ada"]["w"]) + p["ada"]["b"]
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(
        mod, 6, axis=-1
    )
    t = x.shape[1]
    # per-row modulation (continuous serving: each request at its own NFE
    # step) — the fused kernels below take ONE shared mod vector, so they
    # require mod batch dim 1
    shared_mod = mod.shape[0] == 1
    on_tpu = jax.default_backend() == "tpu"
    # W8A8 fused attention projections (quantize=8 mode): the LN+modulate
    # prologue, per-row activation quantization, int8 MXU matmul, and the
    # rescale/bias(/gated-residual) epilogues each stay in ONE Pallas
    # kernel, so the int8 dot's ~1.4x MXU advantage is not eaten by fusion
    # breaks (the round-1 standalone-kernel failure, ops/quant_matmul.py).
    interp = Q8_INTERPRET and not on_tpu
    attn_q8 = (USE_FUSED_Q8 and (on_tpu or interp) and shared_mod
               and t % 128 == 0
               and t <= 4096 and cfg.head_dim % 64 == 0
               and _is_q8(p["attn"]["wqkv"]) and _is_q8(p["attn"]["wo"]))
    if attn_q8:
        from ..ops.quant_matmul import ln_qkv_q8, out_proj_residual_q8

        wqkv, wo = p["attn"]["wqkv"], p["attn"]["wo"]
        mods_a = jnp.concatenate([shift_msa[0], scale_msa[0]], axis=0)
        qkv = ln_qkv_q8(x, mods_a, wqkv.q, wqkv.scale, p["attn"]["bqkv"],
                        interpret=interp)
        flat_ok = (128 % cfg.head_dim == 0
                   and cfg.heads % (128 // cfg.head_dim) == 0)
        if interp:
            q, k, v = _rope_qkv_flat(qkv, rope_cos, rope_sin, cfg.heads,
                                     cfg.head_dim)
            o = _plain_packed(q, k, v, kv_len)               # (B, T, H*D)
        elif flat_ok:
            # flat-qkv flash with in-kernel RoPE (see _dit_attention)
            from ..ops.flash_attention import flash_attention_flat

            o = flash_attention_flat(qkv, rope_cos, rope_sin, kv_len,
                                     heads=cfg.heads,
                                     kv_split=cfg.attn_kv_split)
        else:
            q, k, v = _rope_qkv_flat(qkv, rope_cos, rope_sin, cfg.heads,
                                     cfg.head_dim)
            o = _flash_packed(q, k, v, kv_len, cfg.head_dim)  # (B, T, H*D)
        x = out_proj_residual_q8(o, wo.q, wo.scale, p["attn"]["bo"],
                                 gate_msa.reshape(-1), x, interpret=interp)
    else:
        norm = layer_norm(x, eps=1e-6) * (1 + scale_msa) + shift_msa
        x = x + gate_msa * _dit_attention(p["attn"], norm, rope_cos,
                                          rope_sin, cfg.heads, cfg.head_dim,
                                          kv_len, cfg.attn_kv_split)
    # (Bm, 3, D) mods for the fused MLP kernels: Bm=1 shared (NFE scan)
    # or Bm=2B per row (continuous serving) — the kernel grid indexes the
    # batch row, so per-row modulation fuses just as well
    if (USE_FUSED_Q8 and (on_tpu or interp) and t % 32 == 0
            and _is_q8(p["ff1"]["w"]) and _is_q8(p["ff2"]["w"])):
        from ..ops.dit_mlp import mlp_block_fused_q8

        mods = jnp.concatenate([shift_mlp, scale_mlp, gate_mlp], axis=1)
        return mlp_block_fused_q8(
            x, mods, p["ff1"]["w"].q, p["ff1"]["w"].scale, p["ff1"]["b"],
            p["ff2"]["w"].q, p["ff2"]["w"].scale, p["ff2"]["b"],
            interpret=interp)
    if (USE_FUSED_MLP and on_tpu and t % 8 == 0
            and not hasattr(p["ff1"]["w"], "scale")
            # both weights must fit scoped VMEM (16 MB) alongside the
            # activation blocks: fine in bf16 (8.4 MB at D=1024/F=2048),
            # impossible in fp32 (16.8 MB — compile-time VMEM OOM); fp32
            # callers take the XLA path below
            and 2 * p["ff1"]["w"].size * p["ff1"]["w"].dtype.itemsize
            <= 12 << 20):
        # fused LN+modulate -> ff1 -> gelu -> ff2 -> gated residual: one
        # Pallas program per row-block, both MLP weights VMEM-resident
        # (ops/dit_mlp.py) — removes 3 HBM round-trips over the activations
        from ..ops.dit_mlp import mlp_block_fused

        mods = jnp.concatenate([shift_mlp, scale_mlp, gate_mlp], axis=1)
        return mlp_block_fused(x, mods, p["ff1"]["w"], p["ff1"]["b"],
                               p["ff2"]["w"], p["ff2"]["b"])
    norm = layer_norm(x, eps=1e-6) * (1 + scale_mlp) + shift_mlp
    h = dense(norm, p["ff1"]["w"]) + p["ff1"]["b"]
    h = jax.nn.gelu(h, approximate=True)
    h = dense(h, p["ff2"]["w"]) + p["ff2"]["b"]
    return x + gate_mlp * h


def _dit_block_cached(p, x, t_emb, rope_cos, rope_sin, cfg: F5Config,
                      kv_len, cached_attn, cached_ff, use_cache: bool,
                      mod=None):
    """_dit_block with the attention and FF sub-module outputs exposed for
    cross-step caching. With use_cache=True the expensive sub-modules are
    skipped and their previous-step outputs are re-modulated by THIS step's
    AdaLN gates — the FORA-style DiT layer cache (arXiv:2509.08696: adjacent
    diffusion steps produce near-identical layer activations)."""
    if mod is None:
        mod = jnp.matmul(jax.nn.silu(t_emb), p["ada"]["w"]) + p["ada"]["b"]
    s1, c1, g1, s2, c2, g2 = jnp.split(mod, 6, axis=-1)
    if use_cache:
        attn_out, ff_out = cached_attn, cached_ff
    else:
        norm = layer_norm(x, eps=1e-6) * (1 + c1) + s1
        attn_out = _dit_attention(p["attn"], norm, rope_cos, rope_sin,
                                  cfg.heads, cfg.head_dim, kv_len,
                                  cfg.attn_kv_split)
    x = x + g1 * attn_out
    if not use_cache:
        norm = layer_norm(x, eps=1e-6) * (1 + c2) + s2
        h = dense(norm, p["ff1"]["w"]) + p["ff1"]["b"]
        h = jax.nn.gelu(h, approximate=True)
        ff_out = dense(h, p["ff2"]["w"]) + p["ff2"]["b"]
    return x + g2 * ff_out, attn_out, ff_out


def dit_forward_cached(params, noise, cond, cond_drop, t_emb, rope_cos,
                       rope_sin, cfg: F5Config, kv_len, cache,
                       use_cache: bool, step_idx=None):
    """dit_forward variant carrying a per-layer (attn, ff) activation cache
    across diffusion steps. cache: ((depth, 2, T, dim) attn,
    (depth, 2, T, dim) ff). use_cache is a PYTHON bool — callers branch the
    two variants with lax.cond. Returns (pred, pred_uncond, new_cache)."""
    x = input_embedding(
        params,
        jnp.concatenate([noise, noise], axis=0),
        jnp.concatenate([cond, cond_drop], axis=0),
    )
    t_emb = t_emb.reshape(1, 1, -1)
    use_tab = step_idx is not None and "ada_table" in params
    cache_attn, cache_ff = cache
    new_attn, new_ff = [], []
    for i, p in enumerate(params["blocks"]):
        mod = params["ada_table"][step_idx, i].reshape(1, 1, -1) \
            if use_tab else None
        x, a, f = _dit_block_cached(p, x, t_emb, rope_cos, rope_sin, cfg,
                                    kv_len, cache_attn[i], cache_ff[i],
                                    use_cache, mod)
        new_attn.append(a)
        new_ff.append(f)
    if use_tab:
        mod = params["norm_out_table"][step_idx].reshape(1, 1, -1)
    else:
        mod = jnp.matmul(jax.nn.silu(t_emb), params["norm_out"]["w"]) \
            + params["norm_out"]["b"]
    scale, shift = jnp.split(mod, 2, axis=-1)
    x = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    x = jnp.matmul(x, params["proj_out"]["w"],
                   preferred_element_type=jnp.float32) + params["proj_out"]["b"]
    new_cache = (jnp.stack(new_attn), jnp.stack(new_ff))
    return (x[:1].astype(noise.dtype), x[1:].astype(noise.dtype), new_cache)


def dit_forward(params, noise: jax.Array, cond: jax.Array, cond_drop: jax.Array,
                t_emb: jax.Array, rope_cos: jax.Array, rope_sin: jax.Array,
                cfg: F5Config, kv_len: jax.Array | None = None,
                step_idx: jax.Array | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """One CFG-paired DiT pass. noise (1, T, n_mels); cond/cond_drop
    (1, T, n_mels+text_dim); t_emb (dim,). Returns (pred_cond, pred_uncond),
    each (1, T, n_mels) — the batch-2 trick of dit.py:217.

    step_idx: NFE step index; when given and attach_mod_tables has run, the
    per-block AdaLN vectors come from the precomputed tables instead of 22
    M=1 matmuls (~0.3 ms/step on TPU at T=1408).

    Batched serving: noise/cond/cond_drop may carry B>1 requests; pass
    kv_len as a (2B,) vector (per-request length, tiled for the cond and
    uncond halves) and the CFG pair runs as batch 2B.

    Continuous serving (serving/continuous_f5): step_idx may be a (B,)
    vector with t_emb (B, dim) — each request integrates at its OWN NFE
    step. Per-row AdaLN vectors then ride as (2B, 1, ·) and the fused
    MLP/Q8 kernels (which take one shared modulation vector) fall back
    to the plain path (_dit_block guards on mod.shape[0])."""
    # one batch-2 embedding call for the CFG pair (the convs are
    # batch-parallel, so this is exactly the two-call result at half the
    # dispatch cost — measured 3.5 -> 2.0 ms/step at t=1536)
    x = input_embedding(
        params,
        jnp.concatenate([noise, noise], axis=0),
        jnp.concatenate([cond, cond_drop], axis=0),
    )                                                               # (2, T, dim)

    def _pair(v):
        """(·,) or (B, ·) modulation source -> (1, 1, ·) or (2B, 1, ·):
        per-row vectors double for the CFG pair (cond/uncond halves share
        their row's step)."""
        v = v.reshape(-1, 1, v.shape[-1])
        return jnp.concatenate([v, v], axis=0) if v.shape[0] > 1 else v

    t_emb = _pair(t_emb if t_emb.ndim > 1 else t_emb.reshape(1, -1))
    use_tab = step_idx is not None and "ada_table" in params
    for li, p in enumerate(params["blocks"]):
        mod = _pair(params["ada_table"][step_idx, li]) if use_tab else None
        x = _dit_block(p, x, t_emb, rope_cos, rope_sin, cfg, kv_len, mod)
    if use_tab:
        mod = _pair(params["norm_out_table"][step_idx])
    else:
        mod = jnp.matmul(jax.nn.silu(t_emb), params["norm_out"]["w"]) \
            + params["norm_out"]["b"]
    scale, shift = jnp.split(mod, 2, axis=-1)
    x = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    x = jnp.matmul(x, params["proj_out"]["w"],
                   preferred_element_type=jnp.float32) + params["proj_out"]["b"]
    nb = noise.shape[0]
    return x[:nb].astype(noise.dtype), x[nb:].astype(noise.dtype)


# --------------------------------------------------------------------------
# Pipeline stages

def f5_preprocess(params, audio: jax.Array, text_ids: jax.Array,
                  max_duration: int, cfg: F5Config, noise_key: jax.Array):
    """Stage A (Export_F5.py:98-141): audio (1, N) float in [-1, 1];
    text_ids (1, T_text) raw vocab ids. Returns
    (noise, cat_mel_text, cat_mel_text_drop, ref_signal_len)."""
    melspec = MelSpectrogram(
        cfg.sample_rate, cfg.n_fft, cfg.hop, cfg.win_length, cfg.n_mels
    )
    mel = melspec(audio)                                            # (1, T_ref, M)
    ref_signal_len = mel.shape[1]
    mel = jnp.pad(mel, ((0, 0), (0, max_duration - ref_signal_len), (0, 0)))
    noise = jax.random.normal(noise_key, (1, max_duration, cfg.n_mels))
    text, text_drop = text_embedding(params, text_ids, max_duration, cfg)
    cat_mel_text = jnp.concatenate([mel, text], axis=-1)
    zeros = jnp.zeros_like(mel)
    cat_mel_text_drop = jnp.concatenate([zeros, text_drop], axis=-1)
    return noise, cat_mel_text, cat_mel_text_drop, ref_signal_len


def f5_denoise(params, noise: jax.Array, cat_mel_text: jax.Array,
               cat_mel_text_drop: jax.Array, cfg: F5Config) -> jax.Array:
    """Stage B: the full NFE loop as one lax.scan (replaces the reference's
    Python loop over session_B calls, F5-TTS-ONNX-Inference.py:291-304).

    Scans nfe_steps-1 Euler steps; carry = noise."""
    max_duration = noise.shape[1]
    rope_cos = params["rope_cos"][:max_duration]
    rope_sin = params["rope_sin"][:max_duration]
    time_table = params["time_table"]                               # (nfe, dim)
    delta_t = params["delta_t"]                                     # (nfe-1,)

    def step(carry, idx):
        pred, pred1 = dit_forward(
            params, carry, cat_mel_text, cat_mel_text_drop,
            time_table[idx], rope_cos, rope_sin, cfg,
        )
        carry = carry + (pred + (pred - pred1) * cfg.cfg_strength) * delta_t[idx]
        return carry, None

    denoised, _ = jax.lax.scan(step, noise, jnp.arange(cfg.nfe_steps - 1))
    return denoised


# --------------------------------------------------------------------------
# Random init (tests / benches; real weights from weights/f5_loader.py)

def init_params(cfg: F5Config, key: jax.Array, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 1024))

    def lin(cin, cout, scale=0.02):
        return {
            "w": jax.random.normal(next(keys), (cin, cout), dtype) * scale,
            "b": jnp.zeros((cout,), dtype),
        }

    def conv(k, cin, cout, groups=1):
        # WIO layout: in-channel dim is per-group (cin // groups)
        return {
            "w": jax.random.normal(next(keys), (k, cin // groups, cout), dtype) * 0.02,
            "b": jnp.zeros((cout,), dtype),
        }

    def ln(c):
        return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    td, d = cfg.text_dim, cfg.dim
    inner = cfg.inner_dim
    scale = cfg.head_dim ** -0.25

    # per-head column permutation to the half-split rope layout (hs_perm)
    col_perm = (np.arange(inner).reshape(cfg.heads, cfg.head_dim)
                [:, hs_perm(cfg.head_dim)].reshape(-1))

    def attn_p():
        q = lin(d, inner)
        k = lin(d, inner)
        v = lin(d, inner)
        # load-time folds: q,k weights carry d^-0.25 each and their feature
        # columns are permuted to the half-split rope layout
        wqkv = jnp.concatenate([q["w"][:, col_perm] * scale,
                                k["w"][:, col_perm] * scale, v["w"]], axis=-1)
        bqkv = jnp.concatenate([q["b"][col_perm] * scale,
                                k["b"][col_perm] * scale, v["b"]])
        o = lin(inner, d)
        return {"wqkv": wqkv, "bqkv": bqkv, "wo": o["w"], "bo": o["b"]}

    params = {
        "text_embed": {
            "embed": jax.random.normal(next(keys), (cfg.vocab_size + 1, td), dtype) * 0.02,
            "blocks": [
                {
                    "dwconv": conv(7, td, td, groups=td),
                    "norm": ln(td),
                    "pw1": lin(td, td * cfg.conv_mult),
                    "grn": {"gamma": jnp.zeros((1, 1, td * cfg.conv_mult), dtype),
                            "beta": jnp.zeros((1, 1, td * cfg.conv_mult), dtype)},
                    "pw2": lin(td * cfg.conv_mult, td),
                }
                for _ in range(cfg.conv_layers)
            ],
        },
        "text_freqs_cis": jnp.asarray(_text_freqs_cis(td, cfg.max_signal_len), dtype),
        "input_embed": {
            "proj": lin(cfg.n_mels * 2 + td, d),
            "conv1": conv(31, d, d, groups=16),
            "conv2": conv(31, d, d, groups=16),
        },
        "blocks": [
            {
                "ada": lin(d, d * 6),
                "attn": attn_p(),
                "ff1": lin(d, d * cfg.ff_mult),
                "ff2": lin(d * cfg.ff_mult, d),
            }
            for _ in range(cfg.depth)
        ],
        "norm_out": lin(d, d * 2),
        "proj_out": lin(d, cfg.n_mels),
    }
    rope_cos, rope_sin = f5_rope_tables(cfg.max_signal_len, cfg.head_dim)
    params["rope_cos"] = jnp.asarray(rope_cos, dtype)
    params["rope_sin"] = jnp.asarray(rope_sin, dtype)
    ts, dts = f5_time_schedule(cfg.nfe_steps, cfg.sway_coef)
    # time-MLP table precomputed host-side (numpy RNG keeps init jittable)
    rng = np.random.default_rng(0)
    mlp_w1 = rng.standard_normal((cfg.freq_embed_dim, d)).astype(np.float32) * 0.02
    mlp_w2 = rng.standard_normal((d, d)).astype(np.float32) * 0.02
    params["time_table"] = jnp.asarray(
        f5_time_embed_table(ts, mlp_w1, np.zeros(d, np.float32),
                            mlp_w2, np.zeros(d, np.float32),
                            cfg.freq_embed_dim),
        dtype,
    )
    params["delta_t"] = jnp.asarray(dts)     # fp32: Euler carry stays fp32
    return attach_mod_tables(params, cfg)
