"""KaniTTS acoustic LM — LFM2-style hybrid conv+attention decoder, TPU-native.

Behavioral contract from the reference KANITTS_MAIN wrapper
(/root/reference/Kani_TTS/Export_Kani_TTS.py:199-471):
  * interleaved layer types: GQA attention layers (with per-head q/k RMSNorm
    and RoPE) and LFM2 short-conv layers (in_proj -> B,C,x gating, causal
    depthwise conv over a 2-sample carried state, C * conv_out -> out_proj);
  * every layer: pre-RMSNorm (weight absorbed into the following projection
    at load time), residual, SwiGLU FFN with ffn_norm absorbed into w1/w3;
  * final embedding_norm absorbed into lm_head; logits over the codec vocab.

TPU re-design (not a port):
  * the reference threads (keys x L, values x L, convs x C) through ONNX
    graph I/O with concat growth; here KV lives in a static kv/cache.KVCache
    and conv state in a (num_conv_layers, B, 2, H) buffer — the whole decode
    loop compiles to one lax.while_loop (decoding/loop.py);
  * GQA runs through nn/attention.gqa_attention (broadcast over groups);
  * the attention scale d^-0.5 is folded into the q/k per-head norm weights
    at load (weights/kani_loader.py), matching Export_Kani_TTS.py:309-342.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..kv.cache import KVCache
from ..nn.attention import combine_kv_valid, attention_mask, gqa_attention
from ..nn.norm import rms_norm
from ..nn.rope import apply_rope
from ..ops.conv import conv1d
from ..quant.weight_only import dense

__all__ = ["KaniConfig", "KaniState", "kani_step", "init_params", "init_state"]


@dataclass(frozen=True)
class KaniConfig:
    """Defaults sized for kani-tts-370m (LFM2-350M backbone); the loader
    overrides all fields from the checkpoint's config.json."""

    hidden_size: int = 1024
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 64
    ffn_dim: int = 4608
    vocab_size: int = 80538
    # layer i is "conv" or "attn" — LFM2-350M interleave
    layer_types: tuple[str, ...] = (
        "conv", "conv", "attn", "conv", "conv", "attn", "conv", "conv",
        "attn", "conv", "attn", "conv", "attn", "conv", "attn", "conv",
    )
    conv_kernel: int = 3
    rope_base: float = 1000000.0
    rms_eps: float = 1e-5
    max_seq_len: int = 1024
    stop_token: int = 64402

    @property
    def num_attn_layers(self) -> int:
        return sum(1 for t in self.layer_types if t == "attn")

    @property
    def num_conv_layers(self) -> int:
        return sum(1 for t in self.layer_types if t == "conv")


@jax.tree_util.register_pytree_node_class
class KaniState:
    """Decode-loop carried state: KV cache + conv states.

    conv: (num_conv_layers, B, conv_kernel-1, H) — the 2-sample causal carry
    (reference saves conv_state[..., -2:], Export_Kani_TTS.py:455)."""

    def __init__(self, kv: KVCache, conv: jax.Array):
        self.kv = kv
        self.conv = conv

    def tree_flatten(self):
        return (self.kv, self.conv), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_state(cfg: KaniConfig, batch: int = 1, kv_dtype=jnp.bfloat16) -> KaniState:
    return KaniState(
        kv=KVCache.create(cfg.num_attn_layers, batch, cfg.num_kv_heads,
                          cfg.max_seq_len, cfg.head_dim, kv_dtype),
        conv=jnp.zeros((cfg.num_conv_layers, batch, cfg.conv_kernel - 1,
                        cfg.hidden_size), kv_dtype),
    )


def _attn_layer(p, x, state: KaniState, layer_idx: int, cfg: KaniConfig,
                rope_cos, rope_sin, mask, fused: bool = False):
    """GQA attention with per-head q/k RMSNorm (scale folded into the norm
    weights) and static-buffer KV append. fused=True routes the decode
    (S=1) qkv head through the Pallas kernel (ops/decode_qkv.py)."""
    b, s, _ = x.shape
    q_sz = cfg.num_heads * cfg.head_dim
    kv_sz = cfg.num_kv_heads * cfg.head_dim
    if fused == "step":
        # qkv head + GQA attention in ONE kernel (ops/decode_step.py);
        # kani_step's gate guarantees b == s == 1, plain causal mask
        from ..ops.decode_step import fused_qkv_attn

        attn_flat, kf, vf = fused_qkv_attn(
            x[:, 0], p["wqkv"], rope_cos, rope_sin, state.kv.k,
            state.kv.v, layer_idx, state.kv.length, heads=cfg.num_heads,
            kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
            q_norm=p["q_norm"], k_norm=p["k_norm"], eps=cfg.rms_eps)
        kv, _, _ = state.kv.update_layer(
            layer_idx, kf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim),
            vf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim))
        return dense(attn_flat[:, None], p["wo"]), KaniState(kv, state.conv)
    if fused:
        from ..ops.decode_qkv import fused_qkv_rope

        qf, kf, vf = fused_qkv_rope(
            x[:, 0], p["wqkv"], rope_cos, rope_sin, heads=cfg.num_heads,
            kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
            q_norm=p["q_norm"], k_norm=p["k_norm"], eps=cfg.rms_eps)
        q = qf.reshape(b, 1, cfg.num_heads, cfg.head_dim)
        k = kf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        v = vf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
    else:
        h = rms_norm(x, eps=cfg.rms_eps)        # weight absorbed into wqkv
        qkv = dense(h, p["wqkv"])
        q = qkv[..., :q_sz].reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = qkv[..., q_sz:q_sz + kv_sz].reshape(b, s, cfg.num_kv_heads,
                                                cfg.head_dim)
        v = qkv[..., q_sz + kv_sz:].reshape(b, s, cfg.num_kv_heads,
                                            cfg.head_dim)

        q = rms_norm(q, p["q_norm"], eps=cfg.rms_eps)
        k = rms_norm(k, p["k_norm"], eps=cfg.rms_eps)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)

    kv, k_full, v_full = state.kv.update_layer(layer_idx, k, v)
    state = KaniState(kv, state.conv)
    out = gqa_attention(q, k_full, v_full, mask)
    out = out.reshape(b, s, -1)
    return dense(out, p["wo"]), state


def _conv_layer(p, x, state: KaniState, conv_idx: int, cfg: KaniConfig,
                valid_len=None):
    """LFM2 short-conv mixer (Export_Kani_TTS.py:446-461): in_proj ->
    (B, C, x) gates, Bx through a causal depthwise conv with a carried
    (k-1)-sample state, output C * conv_out -> out_proj. valid_len (scalar)
    marks the true sequence end inside a padded bucket: the carry is taken
    from the last k-1 VALID inputs (batched prefill)."""
    h = rms_norm(x, eps=cfg.rms_eps)            # weight absorbed into in_proj
    bcx = dense(h, p["in_proj"])
    b_gate, c_gate, xv = jnp.split(bcx, 3, axis=-1)
    bx = b_gate * xv                                            # (B, S, H)

    carry = state.conv[conv_idx].astype(bx.dtype)               # (B, k-1, H)
    seq = jnp.concatenate([carry, bx], axis=1)                  # (B, k-1+S, H)
    if valid_len is None:
        new_carry = seq[:, -(cfg.conv_kernel - 1):].astype(state.conv.dtype)
    else:
        # inputs at seq positions [valid_len, valid_len + k-1) are the last
        # k-1 valid samples (seq is left-extended by the k-1 carry)
        new_carry = jax.lax.dynamic_slice(
            seq, (0, valid_len, 0),
            (seq.shape[0], cfg.conv_kernel - 1, seq.shape[2]),
        ).astype(state.conv.dtype)
    state = KaniState(
        state.kv,
        jax.lax.dynamic_update_index_in_dim(state.conv, new_carry, conv_idx, 0),
    )
    # valid depthwise conv == the reference's pad-then-double-trim
    conv_out = conv1d(seq, p["conv_w"], p.get("conv_b"), padding=0,
                      groups=cfg.hidden_size)                   # (B, S, H)
    out = c_gate * conv_out
    return dense(out, p["out_proj"]), state


def _ffn(p, x, cfg: KaniConfig):
    h = rms_norm(x, eps=cfg.rms_eps)            # ffn_norm absorbed into w1/w3
    gu = dense(h, p["w_gate_up"])
    gate, up = jnp.split(gu, 2, axis=-1)
    return dense(jax.nn.silu(gate) * up, p["w_down"])


def kani_step(params, hidden: jax.Array, state: KaniState, cfg: KaniConfig,
              valid_len=None, key_valid_from=None, fused: bool = False
              ) -> tuple[jax.Array, KaniState]:
    """One LM step over S new tokens. hidden: (B, S, H) embedded inputs.
    Returns (logits (B, vocab), new state with kv.length advanced).
    valid_len: true length inside a padded bucket (batched prefill) — the
    logits come from position valid_len-1 and the conv carries from the
    last valid inputs; the caller rewinds kv.length to valid_len.
    key_valid_from: (B,) first valid kv position per batch row — the
    left-aligned multi-request serving layout (prompts right-justified in
    the bucket; rope attention only sees relative offsets, so the shared
    shift is free, and the caller zeroes the pad embeddings so the conv
    mixers see the same leading zeros a fresh sequence starts with)."""
    b, s, _ = hidden.shape
    pos = state.kv.length
    rope_cos = jax.lax.dynamic_slice(
        params["rope_cos"], (pos, 0), (s, cfg.head_dim))
    rope_sin = jax.lax.dynamic_slice(
        params["rope_sin"], (pos, 0), (s, cfg.head_dim))
    mask = attention_mask(s, cfg.max_seq_len, pos, pos + s, causal=True)
    if key_valid_from is not None:
        mask = combine_kv_valid(
            mask, jnp.arange(cfg.max_seq_len)[None, :]
            >= key_valid_from[:, None])

    x = hidden
    attn_i = conv_i = 0
    if fused:
        from ..ops.decode_qkv import fusable_layout, fusable_weight

        ok = (fusable_layout(hidden.shape[0], cfg.num_heads,
                             cfg.num_kv_heads, cfg.head_dim)
              and all(fusable_weight(p["wqkv"]) for lt, p in
                      zip(cfg.layer_types, params["layers"])
                      if lt == "attn"))
        if not ok:
            fused = False
    # "step" (qkv+attention single kernel) additionally needs the M=1
    # plain-causal geometry; degrade to the qkv head otherwise
    if fused == "step" and (b != 1 or s != 1 or key_valid_from is not None
                            or cfg.head_dim not in (64, 128)
                            or (cfg.num_heads * cfg.head_dim) % 128
                            or (cfg.num_kv_heads * cfg.head_dim) % 128):
        fused = True
    fuse = fused if s == 1 else False
    for lt, p in zip(cfg.layer_types, params["layers"]):
        if lt == "attn":
            out, state = _attn_layer(p, x, state, attn_i, cfg,
                                     rope_cos, rope_sin, mask, fused=fuse)
            attn_i += 1
        else:
            out, state = _conv_layer(p, x, state, conv_i, cfg, valid_len)
            conv_i += 1
        x = x + out
        x = x + _ffn(p["ffn"], x, cfg)

    state = KaniState(state.kv.advance(s), state.conv)
    if valid_len is None:
        last = x[:, -1]
    else:
        last = jax.lax.dynamic_slice(
            x, (0, valid_len - 1, 0), (b, 1, x.shape[2]))[:, 0]
    final = rms_norm(last, eps=cfg.rms_eps)      # embedding_norm in lm_head
    logits = dense(final, params["lm_head"])
    return logits, state


def embed_tokens(params, ids: jax.Array) -> jax.Array:
    """(B, S) int ids -> (B, S, H)."""
    return params["embed"][ids]


def init_params(cfg: KaniConfig, key: jax.Array, dtype=jnp.float32):
    """Random init with the load-time folds already applied (norm weights =
    1 absorbed, q/k norms carry the d^-0.25 scale)."""
    keys = iter(jax.random.split(key, 8 * len(cfg.layer_types) + 16))
    hs, hd = cfg.hidden_size, cfg.head_dim

    def mat(cin, cout, scale=0.02):
        return jax.random.normal(next(keys), (cin, cout), dtype) * scale

    scale = hd ** -0.25
    layers = []
    for lt in cfg.layer_types:
        p = {"ffn": {
            "w_gate_up": mat(hs, 2 * cfg.ffn_dim),
            "w_down": mat(cfg.ffn_dim, hs),
        }}
        if lt == "attn":
            p.update(
                wqkv=mat(hs, (cfg.num_heads + 2 * cfg.num_kv_heads) * hd),
                q_norm=jnp.full((hd,), scale, dtype),
                k_norm=jnp.full((hd,), scale, dtype),
                wo=mat(cfg.num_heads * hd, hs),
            )
        else:
            p.update(
                in_proj=mat(hs, 3 * hs),
                conv_w=jax.random.normal(next(keys), (cfg.conv_kernel, 1, hs),
                                         dtype) * 0.2,
                out_proj=mat(hs, hs),
            )
        layers.append(p)

    from ..nn.rope import rope_table

    rope_cos, rope_sin = rope_table(cfg.max_seq_len, hd, cfg.rope_base)
    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, hs), dtype) * 0.02,
        "layers": layers,
        "lm_head": mat(hs, cfg.vocab_size),
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
    }
