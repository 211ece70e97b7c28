"""IndexTTS (1.5) — conformer reference encoder, perceiver resampler, ECAPA
speaker encoder, GPT-2 AR acoustic model — TPU-native.

Behavioral contract from the reference export wrappers
(/root/reference/IndexTTS/Export_IndexTTS.py):
  * graph A (:61-200): ref audio (+100 ms noise pad) -> mel -> (a) conformer
    conditioning encoder with ESPnet legacy rel-position attention
    (pos_bias_u/v + rel_shift) and a conv module (GLU, depthwise, LN, swish)
    -> perceiver resampler over 32 latents -> conds_latent; (b) ECAPA-TDNN
    speaker encoder -> per-upsample-stage BigVGAN conditioning vectors;
  * graph B (:203-214): [0] text [1] wrap + text embedding + learned pos;
  * graph C (:217-225): mel-code embedding + learned pos at gen_len;
  * graph D (:228-235): concat [conds_latent, text_emb, gpt_emb];
  * graph E (:238-289): GPT-2 step (ln_1 / causal attn / ln_2 / gelu MLP),
    final ln_f, lm_head scaled by a repetition-penalty vector, argmax;
  * graph F (:292-314): final_norm over the collected hidden states minus
    the last 2 -> speaker-conditioned BigVGAN (models/bigvgan.py) -> int16.

TPU re-design: the 6-graph partition collapses into three jitted programs
(encode reference, AR while_loop, vocode); the penalty vector and its
sliding reset window live in the decode loop's carry instead of host numpy
(runtime/indextts.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from ..nn.attention import combine_kv_valid, attention_mask
from ..nn.norm import layer_norm
from ..ops.conv import conv1d
from ..quant.weight_only import dense

__all__ = [
    "IndexTTSConfig",
    "conformer_encoder",
    "perceiver_resample",
    "ecapa_speaker_encoder",
    "gpt_step",
    "init_gpt_params",
    "init_conformer_params",
    "init_perceiver_params",
    "init_ecapa_params",
]


@dataclass(frozen=True)
class IndexTTSConfig:
    """Defaults = IndexTTS-1.5 (config.yaml of the upstream checkpoint)."""

    # conformer conditioning encoder
    enc_dim: int = 512
    enc_heads: int = 8
    enc_ff_dim: int = 2048
    enc_layers: int = 6
    enc_conv_kernel: int = 15
    # perceiver
    num_latents: int = 32
    perceiver_heads: int = 8
    perceiver_dim_head: int = 64
    perceiver_ff_mult: int = 4
    # ECAPA speaker encoder
    n_mels: int = 100
    ecapa_channels: int = 512
    ecapa_attn_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    speaker_embed_dim: int = 512
    # GPT-2 acoustic model
    gpt_dim: int = 1280
    gpt_heads: int = 20
    gpt_layers: int = 24
    num_mel_codes: int = 8194
    num_text_tokens: int = 12001
    max_text_tokens: int = 600
    max_mel_tokens: int = 800
    max_seq_len: int = 1536
    stop_token: int = 8193
    start_mel_token: int = 8192

    @property
    def gpt_head_dim(self) -> int:
        return self.gpt_dim // self.gpt_heads


# --------------------------------------------------------------------------
# Conformer conditioning encoder (graph A part 1)

def _rel_shift(bd: jax.Array) -> jax.Array:
    """ESPnet legacy rel_shift (Export_IndexTTS.py:67-71): prepend a zero
    column on the position axis, fold, drop the first row."""
    h, t, p = bd.shape
    padded = jnp.pad(bd, ((0, 0), (0, 0), (1, 0)))        # (H, T, P+1)
    padded = padded.reshape(h, p + 1, t)
    return padded[:, 1:].reshape(h, t, p)[:, :, :t]


def _rel_pos_attention(p, x: jax.Array, pos_emb: jax.Array, heads: int,
                       head_dim: int) -> jax.Array:
    """Relative-position MHA with pos_bias_u/v. x: (1, T, D); the d^-0.25
    scale is folded into Wq/Wk/Wpos/biases at load (:94-129).

    Weights stored per-head (H, D, d) so attention runs as head-batched
    matmuls — the reference's layout trick maps directly onto einsum."""
    q = jnp.einsum("td,hde->hte", x[0], p["wq"]) + p["bq"]
    k = jnp.einsum("td,hde->hte", x[0], p["wk"]) + p["bk"]
    v = jnp.einsum("td,hde->hte", x[0], p["wv"]) + p["bv"]
    pos = jnp.einsum("td,hde->hte", pos_emb, p["wpos"])    # (H, P, d)

    ac = jnp.einsum("hte,hse->hts", q + p["bias_u"], k,
                    preferred_element_type=jnp.float32)
    bd = jnp.einsum("hte,hpe->htp", q + p["bias_v"], pos,
                    preferred_element_type=jnp.float32)
    scores = ac + _rel_shift(bd)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("hts,hse->hte", probs, v)
    out = jnp.einsum("hte,hed->td", out, p["wo"]) + p["bo"]
    return out[None]


def _conformer_conv(p, x: jax.Array, kernel: int) -> jax.Array:
    """pointwise(2C) -> GLU -> depthwise(k) -> LN -> swish -> pointwise
    (Export_IndexTTS.py:154-161)."""
    h = jnp.matmul(x, p["pw1"]["w"]) + p["pw1"]["b"]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)                              # GLU
    h = conv1d(h, p["dw"]["w"], p["dw"]["b"], padding=(kernel - 1) // 2,
               groups=h.shape[-1])
    h = layer_norm(h, p["norm"]["w"], p["norm"]["b"])
    h = h * jax.nn.sigmoid(h)                              # swish
    return jnp.matmul(h, p["pw2"]["w"]) + p["pw2"]["b"]


def conformer_encoder(params, mel: jax.Array, cfg: IndexTTSConfig) -> jax.Array:
    """mel (1, T, n_mels) -> (1, T', enc_dim), T' = ((T-1)//2 - 1)//2
    (Conv2dSubsampling4 + rel-pos conformer blocks, Export_IndexTTS.py:141-163)."""
    # subsample: two stride-2 3x3 Conv2d over (time, mel) with ReLU
    x = mel[:, None, :, :]                                 # (1, 1, T, F) NCHW
    for cp in params["sub_convs"]:
        x = jax.lax.conv_general_dilated(
            x.astype(cp["w"].dtype), cp["w"], window_strides=(2, 2),
            padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + cp["b"][None, :, None, None]
        x = jax.nn.relu(x)
    b, c, t, f = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, t, c * f)
    # xscale is folded into the out projection at load (:84-85)
    x = jnp.matmul(x, params["out"]["w"]) + params["out"]["b"]
    pos_emb = params["pos_enc"][:t]

    for p in params["layers"]:
        h = layer_norm(x, p["norm_mha"]["w"], p["norm_mha"]["b"])
        x = x + _rel_pos_attention(p["attn"], h, pos_emb, cfg.enc_heads,
                                   cfg.enc_dim // cfg.enc_heads)
        h = layer_norm(x, p["norm_conv"]["w"], p["norm_conv"]["b"])
        x = x + _conformer_conv(p["conv"], h, cfg.enc_conv_kernel)
        h = layer_norm(x, p["norm_ff"]["w"], p["norm_ff"]["b"])
        h = jnp.matmul(h, p["ff1"]["w"]) + p["ff1"]["b"]
        h = h * jax.nn.sigmoid(h)                          # swish
        x = x + (jnp.matmul(h, p["ff2"]["w"]) + p["ff2"]["b"])
        x = layer_norm(x, p["norm_final"]["w"], p["norm_final"]["b"])
    return layer_norm(x, params["after_norm"]["w"], params["after_norm"]["b"])


# --------------------------------------------------------------------------
# Perceiver resampler (graph A part 2)

def perceiver_resample(params, x: jax.Array, cfg: IndexTTSConfig) -> jax.Array:
    """Context (1, T, enc_dim) -> (1, num_latents, gpt_dim) via 2
    cross-attention layers from learned latents over cat(latents, context)
    (Export_IndexTTS.py:164-175). The latents live in gpt_dim because graph
    D concats them straight onto the GPT input (:228-235); proj_context maps
    enc_dim -> gpt_dim. Scale folded into to_q/to_k at load."""
    x = jnp.matmul(x, params["proj_context"]["w"]) + params["proj_context"]["b"]
    latents = params["latents"][None]                      # (1, L, D)
    for p in params["layers"]:
        q = jnp.einsum("td,hde->hte", latents[0], p["wq"])
        ctx = jnp.concatenate([latents, x], axis=1)[0]
        k = jnp.einsum("td,hde->hte", ctx, p["wk"])
        v = jnp.einsum("td,hde->hte", ctx, p["wv"])
        scores = jnp.einsum("hte,hse->hts", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("hts,hse->hte", probs, v)
        out = jnp.einsum("hte,hed->td", out, p["wo"])
        latents = latents + out[None]
        h = layer_norm(latents, p["ff_norm"]["w"], p["ff_norm"]["b"])
        h = jnp.matmul(h, p["ff1"]["w"]) + p["ff1"]["b"]
        h = jax.nn.gelu(h, approximate=False)
        latents = latents + (jnp.matmul(h, p["ff2"]["w"]) + p["ff2"]["b"])
    return layer_norm(latents, params["norm"]["w"], params["norm"]["b"])


# --------------------------------------------------------------------------
# ECAPA-TDNN speaker encoder (graph A part 3)

def _bn(x, p):
    """Eval-mode BatchNorm1d over channel-last layout: affine folded from
    running stats at load into (scale, shift)."""
    return x * p["scale"] + p["shift"]


def _tdnn(p, x, dilation: int = 1, reflect_pad: bool = False):
    """Conv1d(k, dilation, same-pad) -> ReLU [-> BN]. x: (1, T, C).

    Two checkpoint families share this block: the speechbrain ECAPA
    (IndexTTS, Export_IndexTTS.py:165-176 — zero pad + BatchNorm, `p` has
    a "bn" entry) and the Qwen3-TTS speaker encoder
    (modeling_qwen3_tts.py:227-248 — padding_mode='reflect', NO BatchNorm,
    `p` has no "bn")."""
    k = p["conv"]["w"].shape[0]
    pad = (k - 1) * dilation // 2
    if reflect_pad and pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        pad = 0
    x = conv1d(x, p["conv"]["w"], p["conv"]["b"], padding=pad, dilation=dilation)
    x = jax.nn.relu(x)
    return _bn(x, p["bn"]) if "bn" in p else x


def _res2net(p, x, scale: int, dilation: int, reflect_pad: bool = False):
    chunks = jnp.split(x, scale, axis=-1)
    outs = [chunks[0]]
    y = None
    for i in range(1, scale):
        inp = chunks[i] if y is None else chunks[i] + y
        y = _tdnn(p["blocks"][i - 1], inp, dilation, reflect_pad)
        outs.append(y)
    return jnp.concatenate(outs, axis=-1)


def _se_block(p, x):
    s = jnp.mean(x, axis=1, keepdims=True)
    s = jax.nn.relu(jnp.matmul(s, p["w1"]) + p["b1"])
    s = jax.nn.sigmoid(jnp.matmul(s, p["w2"]) + p["b2"])
    return x * s


def _stats(x, w, clip: float | None = 1e-6):
    """Weighted mean/std over time (Export_IndexTTS.py:61-64;
    modeling_qwen3_tts.py:212-216 takes the sqrt unclipped).
    x: (1, T, C), w: (1, T, 1) or scalar."""
    mean = jnp.sum(w * x, axis=1, keepdims=True)
    var = jnp.sum(w * (x - mean) ** 2, axis=1, keepdims=True)
    return mean, jnp.sqrt(var if clip is None else jnp.clip(var, min=clip))


def ecapa_speaker_encoder(params, mel: jax.Array, cfg: IndexTTSConfig,
                          *, reflect_pad: bool = False,
                          std_clip: float | None = 1e-6) -> jax.Array:
    """mel (1, T, n_mels) -> speaker embedding (1, 1, speaker_embed_dim)
    (Export_IndexTTS.py:178-195).

    Serves both ECAPA checkpoint families: the speechbrain layout
    (IndexTTS — BatchNorm after every TDNN ReLU, zero 'same' padding,
    clipped pooling std, trailing asp_bn) and the Qwen3-TTS speaker
    encoder (modeling_qwen3_tts.py:291-371 — no BatchNorm anywhere,
    reflect 'same' padding, unclipped std). The variant is carried by
    the params (loaders omit "bn"/"asp_bn" entries for Qwen) plus the
    reflect_pad/std_clip switches; oracled against the reference's own
    module in tests/test_reference_oracle_qwen.py."""
    t = mel.shape[1]
    x = _tdnn(params["block0"], mel, dilation=1, reflect_pad=reflect_pad)
    feats = []
    # SERes2Net stage dilations are fixed (2, 3, 4) — static, not params
    for blk, dilation in zip(params["se_blocks"], (2, 3, 4)):
        res = x
        h = _tdnn(blk["tdnn1"], x, reflect_pad=reflect_pad)
        h = _res2net(blk["res2net"], h, cfg.res2net_scale, dilation,
                     reflect_pad)
        h = _tdnn(blk["tdnn2"], h, reflect_pad=reflect_pad)
        h = _se_block(blk["se"], h)
        x = h + res
        feats.append(x)
    x = jnp.concatenate(feats, axis=-1)
    x = _tdnn(params["mfa"], x, reflect_pad=reflect_pad)
    # attentive statistics pooling with global context
    mean, std = _stats(x, 1.0 / t, std_clip)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)],
        axis=-1,
    )
    a = _tdnn(params["asp_tdnn"], ctx, reflect_pad=reflect_pad)
    a = jnp.tanh(a)
    a = jnp.matmul(a, params["asp_conv"]["w"]) + params["asp_conv"]["b"]
    a = jax.nn.softmax(a, axis=1)
    mean, std = _stats(x, a, std_clip)
    pooled = jnp.concatenate([mean, std], axis=-1)         # (1, 1, 2C)
    if "asp_bn" in params:
        pooled = _bn(pooled, params["asp_bn"])
    return jnp.matmul(pooled, params["fc"]["w"]) + params["fc"]["b"]


# --------------------------------------------------------------------------
# GPT-2 AR acoustic model (graphs B/C/E)

def gpt_embed_text(params, text_ids: jax.Array) -> jax.Array:
    """graph B: [0] + ids + [1], text embed + learned pos (done by caller
    wrapping); here: ids (1, T) -> (1, T, D)."""
    t = text_ids.shape[1]
    return params["text_embed"][text_ids] + params["text_pos"][None, :t]


def gpt_embed_mel(params, mel_ids: jax.Array, gen_len) -> jax.Array:
    """graph C: mel-code id (1, S) -> embedding + pos[gen_len + arange(S)]."""
    s = mel_ids.shape[1]
    pos = params["mel_pos"][gen_len + jnp.arange(s)]
    return params["mel_embed"][mel_ids] + pos[None]


def gpt_step(params, hidden: jax.Array, kv: KVCache, penalty_vec: jax.Array,
             cfg: IndexTTSConfig, kv_valid: jax.Array | None = None,
             fused: bool = False):
    """graph E: one GPT-2 pass over S new positions.
    hidden (B, S, D); penalty_vec (B, vocab) multiplies the logits
    (Export_IndexTTS.py:283-288). kv_valid bool optionally masks out
    bucket-padding holes — (max_seq,) shared or (B, max_seq) per batch row
    (batched serving); GPT-2 here has no positional encoding of its own —
    text/mel positions come from external learned tables — so padded gaps
    only need mask exclusion. Returns (logits, last_hidden, kv)."""
    b, s, d = hidden.shape
    pos = kv.length
    mask = combine_kv_valid(
        attention_mask(s, kv.max_len, pos, pos + s, causal=True), kv_valid)
    x = hidden
    if fused:
        from ..ops.decode_qkv import fusable_layout, fusable_weight

        ok = (fusable_layout(b, cfg.gpt_heads, cfg.gpt_heads,
                             cfg.gpt_head_dim)
              and all(fusable_weight(p["wqkv"])
                      for p in params["layers"]))
        if not ok:
            fused = False
    # "step" (LN+qkv head + MHA attention in one kernel,
    # ops/decode_step.py) needs the M=1 plain-causal geometry
    if fused == "step" and (b != 1 or kv_valid is not None
                            or cfg.gpt_head_dim not in (64, 128)
                            or (cfg.gpt_heads * cfg.gpt_head_dim) % 128):
        fused = True
    fuse = fused if s == 1 else False
    for i, p in enumerate(params["layers"]):
        if fuse == "step":
            from ..ops.decode_step import fused_qkv_attn

            attn_flat, kf, vf = fused_qkv_attn(
                x[:, 0], p["wqkv"], None, None, kv.k, kv.v, i, kv.length,
                heads=cfg.gpt_heads, kv_heads=cfg.gpt_heads,
                head_dim=cfg.gpt_head_dim, bqkv=p["bqkv"], norm="ln",
                ln_weight=p["ln1"]["w"], ln_bias=p["ln1"]["b"], eps=1e-5)
            kv, _, _ = kv.update_layer(
                i, kf.reshape(b, 1, cfg.gpt_heads, cfg.gpt_head_dim),
                vf.reshape(b, 1, cfg.gpt_heads, cfg.gpt_head_dim))
            out = attn_flat[:, None]
            # falls through to the one shared residual + MLP tail below
        elif fuse:
            # fused LN + qkv matvec head (ops/decode_qkv.py); GPT-2 here
            # has no rope and no q/k norms
            from ..ops.decode_qkv import fused_qkv_rope

            qf, kf, vf = fused_qkv_rope(
                x[:, 0], p["wqkv"], heads=cfg.gpt_heads,
                kv_heads=cfg.gpt_heads, head_dim=cfg.gpt_head_dim,
                bqkv=p["bqkv"], norm="ln", ln_weight=p["ln1"]["w"],
                ln_bias=p["ln1"]["b"], eps=1e-5)
            q = qf.reshape(b, 1, cfg.gpt_heads, cfg.gpt_head_dim)
            k = kf.reshape(b, 1, cfg.gpt_heads, cfg.gpt_head_dim)
            v = vf.reshape(b, 1, cfg.gpt_heads, cfg.gpt_head_dim)
        else:
            h = layer_norm(x, p["ln1"]["w"], p["ln1"]["b"], eps=1e-5)
            qkv = dense(h, p["wqkv"]) + p["bqkv"]
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b, s, cfg.gpt_heads, cfg.gpt_head_dim)
            k = k.reshape(b, s, cfg.gpt_heads, cfg.gpt_head_dim)
            v = v.reshape(b, s, cfg.gpt_heads, cfg.gpt_head_dim)
        if fuse != "step":
            kv, k_full, v_full = kv.update_layer(i, k, v)
            from ..nn.attention import gqa_attention

            out = gqa_attention(q, k_full, v_full, mask).reshape(b, s, d)
        x = x + (dense(out, p["wo"]) + p["bo"])
        h = layer_norm(x, p["ln2"]["w"], p["ln2"]["b"], eps=1e-5)
        h = dense(h, p["fc"]["w"]) + p["fc"]["b"]
        h = jax.nn.gelu(h, approximate=True)               # GPT-2 gelu_new
        x = x + (dense(h, p["proj"]["w"]) + p["proj"]["b"])
    kv = kv.advance(s)
    last = layer_norm(x[:, -1], params["ln_f"]["w"], params["ln_f"]["b"],
                      eps=1e-5)
    logits = (dense(last, params["lm_head"]) + params["lm_head_b"]
              ) * penalty_vec
    return logits, last, kv


def gpt_final_norm(params, hidden_stack: jax.Array) -> jax.Array:
    """graph F entry: final_norm over the collected last_hidden states
    (1, T, D) before the vocoder (Export_IndexTTS.py:302)."""
    return layer_norm(hidden_stack, params["final_norm"]["w"],
                      params["final_norm"]["b"], eps=1e-5)


# --------------------------------------------------------------------------
# Random init (tests)

def init_gpt_params(cfg: IndexTTSConfig, key: jax.Array, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16 + 8 * cfg.gpt_layers))
    d = cfg.gpt_dim
    scale = cfg.gpt_head_dim ** -0.25

    def mat(cin, cout, s=0.02):
        return jax.random.normal(next(keys), (cin, cout), dtype) * s

    def ln():
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    layers = []
    for _ in range(cfg.gpt_layers):
        wq, wk, wv = mat(d, d), mat(d, d), mat(d, d)
        layers.append({
            "ln1": ln(),
            "wqkv": jnp.concatenate([wq * scale, wk * scale, wv], axis=-1),
            "bqkv": jnp.zeros((3 * d,), dtype),
            "wo": mat(d, d), "bo": jnp.zeros((d,), dtype),
            "ln2": ln(),
            "fc": {"w": mat(d, 4 * d), "b": jnp.zeros((4 * d,), dtype)},
            "proj": {"w": mat(4 * d, d), "b": jnp.zeros((d,), dtype)},
        })
    return {
        "text_embed": mat(cfg.num_text_tokens + 2, d),
        "text_pos": mat(cfg.max_text_tokens + 2, d),
        "mel_embed": mat(cfg.num_mel_codes, d),
        "mel_pos": mat(cfg.max_mel_tokens + 2, d),
        "layers": layers,
        "ln_f": ln(),
        "final_norm": ln(),
        "lm_head": mat(d, cfg.num_mel_codes),
        "lm_head_b": jnp.zeros((cfg.num_mel_codes,), dtype),
    }


def init_conformer_params(cfg: IndexTTSConfig, key: jax.Array,
                          n_mels: int | None = None, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64 + 16 * cfg.enc_layers))
    d = cfg.enc_dim
    hd = d // cfg.enc_heads
    n_mels = n_mels or cfg.n_mels

    def mat(*shape, s=0.02):
        return jax.random.normal(next(keys), shape, dtype) * s

    def lnp(c=d):
        return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}

    f_out = (((n_mels - 1) // 2 - 1) // 2)
    layers = []
    for _ in range(cfg.enc_layers):
        layers.append({
            "norm_mha": lnp(),
            "attn": {
                "wq": mat(cfg.enc_heads, d, hd), "bq": mat(cfg.enc_heads, 1, hd),
                "wk": mat(cfg.enc_heads, d, hd), "bk": mat(cfg.enc_heads, 1, hd),
                "wv": mat(cfg.enc_heads, d, hd), "bv": mat(cfg.enc_heads, 1, hd),
                "wpos": mat(cfg.enc_heads, d, hd),
                "bias_u": mat(cfg.enc_heads, 1, hd),
                "bias_v": mat(cfg.enc_heads, 1, hd),
                "wo": mat(cfg.enc_heads, hd, d), "bo": mat(d),
            },
            "norm_conv": lnp(),
            "conv": {
                "pw1": {"w": mat(d, 2 * d), "b": mat(2 * d)},
                "dw": {"w": mat(cfg.enc_conv_kernel, 1, d), "b": mat(d)},
                "norm": lnp(),
                "pw2": {"w": mat(d, d), "b": mat(d)},
            },
            "norm_ff": lnp(),
            "ff1": {"w": mat(d, cfg.enc_ff_dim), "b": mat(cfg.enc_ff_dim)},
            "ff2": {"w": mat(cfg.enc_ff_dim, d), "b": mat(d)},
            "norm_final": lnp(),
        })
    return {
        "sub_convs": [
            {"w": mat(d, 1, 3, 3), "b": mat(d)},
            {"w": mat(d, d, 3, 3), "b": mat(d)},
        ],
        "out": {"w": mat(d * f_out, d), "b": mat(d)},
        "pos_enc": mat(4096, d),
        "layers": layers,
        "after_norm": lnp(),
    }


def init_perceiver_params(cfg: IndexTTSConfig, key: jax.Array,
                          dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    d = cfg.gpt_dim
    h, hd = cfg.perceiver_heads, cfg.perceiver_dim_head

    def mat(*shape, s=0.02):
        return jax.random.normal(next(keys), shape, dtype) * s

    def lnp():
        return {"w": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}

    ff_dim = d * cfg.perceiver_ff_mult
    return {
        "proj_context": {"w": mat(cfg.enc_dim, d), "b": mat(d)},
        "latents": mat(cfg.num_latents, d),
        "layers": [
            {
                "wq": mat(h, d, hd), "wk": mat(h, d, hd), "wv": mat(h, d, hd),
                "wo": mat(h, hd, d),
                "ff_norm": lnp(),
                "ff1": {"w": mat(d, ff_dim), "b": mat(ff_dim)},
                "ff2": {"w": mat(ff_dim, d), "b": mat(d)},
            }
            for _ in range(2)
        ],
        "norm": lnp(),
    }


def init_ecapa_params(cfg: IndexTTSConfig, key: jax.Array, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 256))
    c = cfg.ecapa_channels

    def mat(*shape, s=0.02):
        return jax.random.normal(next(keys), shape, dtype) * s

    def tdnn(cin, cout, k):
        return {
            "conv": {"w": mat(k, cin, cout), "b": mat(cout)},
            "bn": {"scale": jnp.ones((cout,), dtype),
                   "shift": jnp.zeros((cout,), dtype)},
        }

    sub = c // cfg.res2net_scale
    se_blocks = []
    for dil in (2, 3, 4):
        se_blocks.append({
            "tdnn1": tdnn(c, c, 1),
            "res2net": {"blocks": [tdnn(sub, sub, 3)
                                   for _ in range(cfg.res2net_scale - 1)]},
            "tdnn2": tdnn(c, c, 1),
            "se": {
                "w1": mat(c, cfg.se_channels), "b1": mat(cfg.se_channels),
                "w2": mat(cfg.se_channels, c), "b2": mat(c),
            },
        })
    mfa_dim = 3 * c
    return {
        "block0": tdnn(cfg.n_mels, c, 5),
        "se_blocks": se_blocks,
        "mfa": tdnn(mfa_dim, mfa_dim, 1),
        "asp_tdnn": tdnn(3 * mfa_dim, cfg.ecapa_attn_channels, 1),
        "asp_conv": {"w": mat(cfg.ecapa_attn_channels, mfa_dim), "b": mat(mfa_dim)},
        "asp_bn": {"scale": jnp.ones((2 * mfa_dim,), dtype),
                   "shift": jnp.zeros((2 * mfa_dim,), dtype)},
        "fc": {"w": mat(2 * mfa_dim, cfg.speaker_embed_dim),
               "b": mat(cfg.speaker_embed_dim)},
    }
