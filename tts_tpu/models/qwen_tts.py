"""Qwen3-TTS — two-level AR LM (talker + RVQ code predictor), TPU-native.

Behavioral contract from the reference export wrappers
(/root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py):
  * TTS_MAIN (:907-1072): Qwen3 decoder layers — per-head q/k RMSNorm with
    the d^-0.25 scale folded in, input/post norms absorbed into qkv/gate_up,
    GQA broadcast attention, 3-axis interleaved M-RoPE (equal position ids
    across modalities, so numerically standard RoPE built interleaved),
    codec head + suppress_logits_bias masking the last 1024 vocab ids
    except EOS (:931-938);
  * TTS_PREDICTOR (:1075-1232): same layer stack behind a
    small_to_mtp_projection; prefill = 2 positions
    [talker last_hidden, codec-group-0 embedding], then 15 decode steps,
    each with its own LM head (final norm folded, :1235-1254) and its own
    next-group embedding table;
  * TTS_EMBED_A/B/C/D (:203-260): text projection (tanh-GELU), talker codec
    embedding, fused per-frame sum of group embeddings + trailing text
    hidden injection, per-group predictor embeddings.

TPU re-design (the reference's worst orchestration overhead — 60+ session
calls per talker frame, SURVEY.md §3.3): the 15 LM heads stack into one
(15, H, V) tensor and the 15+1 group embeddings into (16, V, H), so the
inner predictor loop is a lax.scan and the whole frame step is one fused
jitted region inside the outer lax.while_loop (runtime/qwen.py).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from ..nn.attention import combine_kv_valid, attention_mask, gqa_attention
from ..nn.norm import rms_norm
from ..nn.rope import apply_rope, rope_table
from ..quant.weight_only import dense

__all__ = [
    "Qwen3StackConfig",
    "QwenTTSConfig",
    "qwen3_stack_step",
    "talker_logits",
    "make_suppress_bias",
    "predictor_frame",
    "next_talker_input",
    "init_stack_params",
    "init_talker_params",
    "init_predictor_params",
]


@dataclass(frozen=True)
class Qwen3StackConfig:
    """One Qwen3 decoder stack (talker or code predictor)."""

    hidden_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    ffn_dim: int
    num_layers: int
    rms_eps: float = 1e-6
    rope_base: float = 1000000.0
    max_seq_len: int = 2048


@dataclass(frozen=True)
class QwenTTSConfig:
    """Defaults sized for Qwen3-TTS-0.6B-Base; the loader overrides from the
    checkpoint config.json."""

    talker: Qwen3StackConfig = Qwen3StackConfig(
        hidden_size=1024, num_heads=16, num_kv_heads=8, head_dim=128,
        ffn_dim=3072, num_layers=28, max_seq_len=2048)
    predictor: Qwen3StackConfig = Qwen3StackConfig(
        hidden_size=1024, num_heads=16, num_kv_heads=8, head_dim=128,
        ffn_dim=3072, num_layers=4, max_seq_len=32)
    codec_vocab: int = 3072            # talker codec head vocab
    group_vocab: int = 2048            # per-RVQ-group vocab
    num_code_groups: int = 16
    codec_eos_token_id: int = 2150
    codec_bos_id: int = 2149
    codec_pad_id: int = 2148
    codec_think_id: int = 2154
    codec_think_bos_id: int = 2155
    codec_think_eos_id: int = 2156
    # special TEXT tokens (config.tts_*_token_id, reference :606-607)
    tts_bos_token_id: int = 151672
    tts_eos_token_id: int = 151673
    tts_pad_token_id: int = 151671
    text_vocab: int = 151936
    text_hidden: int = 2048            # talker text_embedding dim (projected)


# --------------------------------------------------------------------------
# Generic Qwen3 decoder stack

def qwen3_stack_step(params, hidden: jax.Array, kv: KVCache,
                     cfg: Qwen3StackConfig, rope_cos, rope_sin,
                     kv_valid: jax.Array | None = None,
                     causal: bool = True, return_all: bool = False,
                     fused: bool = False, _interpret: bool = False):
    """One pass over S new positions. hidden (B, S, H). Norm weights are
    absorbed into qkv/gate_up at load; q/k per-head norms (scale-folded) are
    applied inline. Returns (final_hidden (B, H) pre-head-normed, kv).

    fused=True routes the decode (S=1) qkv head through the Pallas
    fused rms+matvec+norms+rope kernel (ops/decode_qkv.py) — same math,
    talker step 1.56 -> 1.27 ms int8. "mlp"/"attn"/"all" opt into the
    other fused stages (both measured slower at 0.6B shapes — see the
    flag block below and the kernel docstrings); attention and the
    in-place KV append stay in XLA."""
    b, s, _ = hidden.shape
    pos = kv.length
    mask = combine_kv_valid(
        attention_mask(s, kv.max_len, pos, pos + s, causal=causal), kv_valid)
    if fused and s != 1:
        raise ValueError("fused decode path requires S == 1")

    q_sz = cfg.num_heads * cfg.head_dim
    kv_sz = cfg.num_kv_heads * cfg.head_dim
    # fused=True enables the measured-win kernel only (the qkv head:
    # talker step 1.56 -> 1.27 ms int8, benchmarks/qwen_profile.py
    # talker_fqkv). The other two fused stages are opt-in, both measured
    # NET SLOWER at the 0.6B talker shapes and kept as tested levers:
    #   "mlp"/"all": out+MLP tail (+0.35 ms — the in-kernel s8->bf16
    #     casts of 11 MB/layer rate-limit vs XLA's convert-in-matvec);
    #   "attn"/"all": clamped-read decode attention (+0.3 ms — ~8
    #     mostly-idle grid steps/layer cost more than the dense-bucket
    #     read they save once the pipeline buckets KV snugly).
    from ..ops.decode_qkv import fusable_layout, fusable_weight
    # fused="step" absorbs the attention contraction too (qkv head + GQA
    # over the cache in ONE kernel, ops/decode_step.py); M=1 hd=128
    # geometry only, shared-length causal masks only
    fuse_step = (fused == "step" and b == 1 and kv_valid is None
                 and causal and cfg.head_dim == 128
                 and kv.k.shape[1] == 1
                 and all(fusable_weight(p["wqkv"])
                         for p in params["layers"]))
    if fused == "step" and not fuse_step:
        fused = True                                # degrade to qkv head
    fuse_qkv = (fused in (True, "all", "qkv", "mlp_q8")
                and fusable_layout(b, cfg.num_heads, cfg.num_kv_heads,
                                   cfg.head_dim)
                and all(fusable_weight(p["wqkv"])
                        for p in params["layers"]))
    fuse_mlp = fused in ("all", "mlp")
    # W8A8 tail (fused="mlp_q8"): s8 x s8 MXU dots, no weight casts —
    # OUTPUT-CHANGING (activations quantize per row; the reference's ORT
    # dynamic-quant Q8 analog), so never on by default; needs int8
    # QTensor weights
    from ..quant.weight_only import QTensor
    fuse_mlp_q8 = fused == "mlp_q8" and all(
        isinstance(p["wo"], QTensor) and isinstance(p["w_gate_up"], QTensor)
        and isinstance(p["w_down"], QTensor) for p in params["layers"])
    # clamped-read decode attention needs a shared kv_len (no per-row
    # validity masks) and a block-divisible bucket
    fuse_attn = (fused in ("all", "attn") and kv_valid is None
                 and causal and kv.max_len % min(256, kv.max_len) == 0)
    x = hidden
    for i, p in enumerate(params["layers"]):
        if fuse_step:
            from ..ops.decode_step import fused_qkv_attn

            attn_flat, kf, vf = fused_qkv_attn(
                x[:, 0], p["wqkv"], rope_cos, rope_sin, kv.k, kv.v, i,
                kv.length, heads=cfg.num_heads, kv_heads=cfg.num_kv_heads,
                head_dim=cfg.head_dim, q_norm=p["q_norm"],
                k_norm=p["k_norm"], bqkv=p.get("bqkv"), eps=cfg.rms_eps,
                interpret=_interpret)
            kv, _, _ = kv.update_layer(
                i, kf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim),
                vf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim))
            out = attn_flat[:, None]
            # falls through to the one shared residual + MLP tail below
        elif fuse_qkv:
            from ..ops.decode_qkv import fused_qkv_rope

            qf, kf, vf = fused_qkv_rope(
                x[:, 0], p["wqkv"], rope_cos, rope_sin,
                heads=cfg.num_heads, kv_heads=cfg.num_kv_heads,
                head_dim=cfg.head_dim, q_norm=p["q_norm"],
                k_norm=p["k_norm"], bqkv=p.get("bqkv"),
                eps=cfg.rms_eps, interpret=_interpret)
            q = qf.reshape(b, 1, cfg.num_heads, cfg.head_dim)
            k = kf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
            v = vf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim)
        else:
            h = rms_norm(x, eps=cfg.rms_eps)
            qkv = dense(h, p["wqkv"])
            if "bqkv" in p:
                qkv = qkv + p["bqkv"]
            q = qkv[..., :q_sz].reshape(b, s, cfg.num_heads, cfg.head_dim)
            k = qkv[..., q_sz:q_sz + kv_sz].reshape(b, s, cfg.num_kv_heads,
                                                    cfg.head_dim)
            v = qkv[..., q_sz + kv_sz:].reshape(b, s, cfg.num_kv_heads,
                                                cfg.head_dim)
            q = rms_norm(q, p["q_norm"], eps=cfg.rms_eps)
            k = rms_norm(k, p["k_norm"], eps=cfg.rms_eps)
            q = apply_rope(q, rope_cos, rope_sin)
            k = apply_rope(k, rope_cos, rope_sin)
        if not fuse_step:
            kv, k_full, v_full = kv.update_layer(i, k, v)
            if fuse_attn:
                from ..ops.decode_attention import decode_gqa_attention

                out = decode_gqa_attention(
                    q.reshape(b, cfg.num_heads, cfg.head_dim), k_full,
                    v_full, pos + 1,
                    interpret=_interpret).reshape(b, 1, -1)
            else:
                out = gqa_attention(q, k_full, v_full,
                                    mask).reshape(b, s, -1)
        if fuse_mlp_q8:
            from ..ops.decode_mlp import fused_out_mlp_q8

            x = fused_out_mlp_q8(x[:, 0], out[:, 0], p["wo"],
                                 p["w_gate_up"], p["w_down"],
                                 eps=cfg.rms_eps,
                                 interpret=_interpret)[:, None]
        elif fuse_mlp:
            from ..ops.decode_mlp import fused_out_mlp

            x = fused_out_mlp(x[:, 0], out[:, 0], p["wo"], p["w_gate_up"],
                              p["w_down"], eps=cfg.rms_eps,
                              interpret=_interpret)[:, None]
        else:
            x = x + dense(out, p["wo"])
            h = rms_norm(x, eps=cfg.rms_eps)
            gu = dense(h, p["w_gate_up"])
            gate, up = jnp.split(gu, 2, axis=-1)
            x = x + dense(jax.nn.silu(gate) * up, p["w_down"])
    kv = kv.advance(s)
    # final norm weight is folded into the downstream head(s)
    if return_all:
        return rms_norm(x, eps=cfg.rms_eps), kv
    return rms_norm(x[:, -1], eps=cfg.rms_eps), kv


# --------------------------------------------------------------------------
# Talker head

def talker_logits(params, final_hidden: jax.Array, cfg: QwenTTSConfig
                  ) -> jax.Array:
    """codec head + suppress bias (reference :931-938, 1063-1069)."""
    logits = jnp.matmul(final_hidden, params["codec_head"])
    return logits + params["suppress_bias"]


def make_suppress_bias(vocab_size: int, eos_id: int,
                       window: int = 1024) -> np.ndarray:
    bias = np.zeros((1, vocab_size), np.float32)
    if vocab_size <= window:        # degenerate (tiny test vocabs): no mask
        return bias
    ids = [t for t in range(vocab_size - window, vocab_size) if t != eos_id]
    bias[:, ids] = -1e7
    return bias


# --------------------------------------------------------------------------
# Predictor: one full 16-group frame as a scan

def predictor_frame(params, talker_hidden: jax.Array, codec_token0: jax.Array,
                    cfg: QwenTTSConfig, repeat_penalty: float = 1.0,
                    penalty_range: int = 10, fused=False):
    """Generate one frame's remaining 15 RVQ groups.

    talker_hidden: (B, 1, talker_H) last hidden from the talker step;
    codec_token0: (B,) int32 group-0 token from the talker.
    Returns (frame_ids, codec_embed0) — shapes (16,) / (1, 1, talker_H)
    for B=1 (the single-request contract) and (B, 16) / (B, 1, talker_H)
    for batched serving.

    Replaces the reference inner loop of ~60 session calls
    (Export_Qwen_TTS_ONNX.py:2485-2597) with a while-free scan over the
    stacked (15, H, V) LM heads and (15, V, H) group embeddings.
    repeat_penalty != 1 applies the in-frame repetition penalty the
    reference applies on non-prefill predictor steps (:2524-2527).
    """
    pcfg = cfg.predictor
    bsz = talker_hidden.shape[0]
    codec_embed0 = params["talker_codec_embed"][codec_token0][:, None]  # (B,1,H)

    kv = KVCache.create(pcfg.num_layers, bsz, pcfg.num_kv_heads,
                        pcfg.max_seq_len, pcfg.head_dim,
                        talker_hidden.dtype)
    prefill = jnp.concatenate([talker_hidden, codec_embed0], axis=1)
    prefill = jnp.matmul(prefill, params["small_to_mtp"])    # (B, 2, pH)

    rope_cos = params["pred_rope_cos"]
    rope_sin = params["pred_rope_sin"]

    h, kv = qwen3_stack_step(params["predictor"], prefill, kv, pcfg,
                             rope_cos[:2], rope_sin[:2])

    def step(carry, g):
        h, kv, save = carry
        logits = jnp.matmul(h, params["lm_heads"][g])         # (B, Vg)
        if repeat_penalty != 1.0:
            from ..decoding.sampling import apply_repetition_penalty

            logits = apply_repetition_penalty(logits, save, g,
                                              repeat_penalty, penalty_range)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # (B,)
        save = save.at[:, g].set(tok)
        # group embeds live in talker space (they also feed TTS_EMBED_C);
        # the predictor projects every input through small_to_mtp
        # (reference :1196 applies it at forward entry)
        emb = params["group_embeds"][g][tok][:, None]         # (B, 1, tH)
        emb = jnp.matmul(emb, params["small_to_mtp"])
        pos = kv.length
        rc = jax.lax.dynamic_slice(rope_cos, (pos, 0), (1, pcfg.head_dim))
        rs = jax.lax.dynamic_slice(rope_sin, (pos, 0), (1, pcfg.head_dim))
        h, kv = qwen3_stack_step(params["predictor"], emb, kv, pcfg, rc, rs,
                                 fused=fused)
        return (h, kv, save), None

    save = jnp.zeros((bsz, cfg.num_code_groups - 1), jnp.int32)
    (h, kv, save), _ = jax.lax.scan(
        step, (h, kv, save), jnp.arange(cfg.num_code_groups - 1))

    frame_ids = jnp.concatenate([codec_token0[:, None], save], axis=1)
    if bsz == 1:
        return frame_ids[0], codec_embed0                     # (16,)
    return frame_ids, codec_embed0                            # (B, 16)


def predictor_frame_beam(params, talker_hidden: jax.Array,
                         codec_token0: jax.Array, cfg: QwenTTSConfig,
                         beam_size: int, top_k: int,
                         repeat_penalty: float = 1.0,
                         penalty_range: int = 10, fused=False):
    """Beam-search variant of predictor_frame — the reference's
    USE_BEAM_SEARCH predictor path (Export_Qwen_TTS_ONNX.py:2528-2552:
    FIRST_BEAM expands the first group's logits into beam_size rows with the
    KV tiled batch-wise; each later group takes top_k per beam, prunes to the
    joint top beam_size, and reorders KV/history by parent; :2577-2580
    gathers row 0 — the best, since the top_k outputs are sorted — at the
    end). Optional repetition penalty over the ids already chosen in this
    frame mirrors :2524-2527.

    Same contract as predictor_frame: returns (frame_ids (16,), codec_embed0
    (1, 1, talker_H))."""
    pcfg = cfg.predictor
    codec_embed0 = params["talker_codec_embed"][codec_token0][:, None]

    kv = KVCache.create(pcfg.num_layers, beam_size, pcfg.num_kv_heads,
                        pcfg.max_seq_len, pcfg.head_dim, talker_hidden.dtype)
    prefill = jnp.concatenate([talker_hidden, codec_embed0], axis=1)
    prefill = jnp.matmul(prefill, params["small_to_mtp"])    # (1, 2, pH)
    # tile the single hypothesis into beam rows up front (the reference
    # repeats the KV after the first step; prefilling batch=beam identical
    # rows is equivalent and keeps the step shapes static)
    prefill = jnp.broadcast_to(prefill, (beam_size,) + prefill.shape[1:])

    rope_cos = params["pred_rope_cos"]
    rope_sin = params["pred_rope_sin"]
    h, kv = qwen3_stack_step(params["predictor"], prefill, kv, pcfg,
                             rope_cos[:2], rope_sin[:2])

    from ..decoding.beam import beam_init, beam_step
    from ..decoding.sampling import apply_repetition_penalty

    logits0 = jnp.matmul(h[:1], params["lm_heads"][0])        # (1, Vg)
    state = beam_init(logits0, beam_size)
    save = jnp.zeros((beam_size, cfg.num_code_groups - 1), jnp.int32)
    save = save.at[:, 0].set(state.tokens)

    def step(carry, g):
        h, kv, save, log_probs, toks = carry
        emb = params["group_embeds"][g - 1][toks][:, None]    # (beam, 1, tH)
        emb = jnp.matmul(emb, params["small_to_mtp"])
        pos = kv.length
        rc = jax.lax.dynamic_slice(rope_cos, (pos, 0), (1, pcfg.head_dim))
        rs = jax.lax.dynamic_slice(rope_sin, (pos, 0), (1, pcfg.head_dim))
        h, kv = qwen3_stack_step(params["predictor"], emb, kv, pcfg, rc, rs,
                                 fused=fused)
        logits = jnp.matmul(h, params["lm_heads"][g])         # (beam, Vg)
        if repeat_penalty != 1.0:
            logits = apply_repetition_penalty(logits, save, g,
                                              repeat_penalty, penalty_range)
        st = beam_step(logits, log_probs, beam_size, top_k)
        kv = kv.select_batch(st.parent)
        save = save[st.parent].at[:, g].set(st.tokens)
        return (h, kv, save, st.log_probs, st.tokens), None

    carry = (h, kv, save, state.log_probs, state.tokens)
    (h, kv, save, _, _), _ = jax.lax.scan(
        step, carry, jnp.arange(1, cfg.num_code_groups - 1))

    frame_ids = jnp.concatenate([codec_token0, save[0]])      # (16,)
    return frame_ids, codec_embed0


def predictor_frame_beam_batch(params, talker_hidden: jax.Array,
                               codec_token0: jax.Array, cfg: QwenTTSConfig,
                               beam_size: int, top_k: int,
                               repeat_penalty: float = 1.0,
                               penalty_range: int = 10, fused=False):
    """Per-request beam search for batched serving: B independent beams run
    as (B*beam) predictor rows — one stack step per group for the whole
    fleet, per-row joint top-k pruning and KV reorder. Row b reproduces
    predictor_frame_beam on request b exactly (the beam expansion, scoring,
    and parent gather are vmapped per request; each KV/matmul row depends
    only on its own inputs), matching the reference beam semantics
    (Export_Qwen_TTS_ONNX.py:2528-2552) per row.

    talker_hidden (B, 1, tH); codec_token0 (B,).
    Returns (frame_ids (B, 16), codec_embed0 (B, 1, tH))."""
    from ..decoding.beam import beam_init, beam_step
    from ..decoding.sampling import apply_repetition_penalty

    pcfg = cfg.predictor
    bsz = talker_hidden.shape[0]
    rows = bsz * beam_size
    codec_embed0 = params["talker_codec_embed"][codec_token0][:, None]

    kv = KVCache.create(pcfg.num_layers, rows, pcfg.num_kv_heads,
                        pcfg.max_seq_len, pcfg.head_dim,
                        talker_hidden.dtype)
    prefill = jnp.concatenate([talker_hidden, codec_embed0], axis=1)
    prefill = jnp.matmul(prefill, params["small_to_mtp"])     # (B, 2, pH)
    prefill = jnp.broadcast_to(
        prefill[:, None], (bsz, beam_size) + prefill.shape[1:]
    ).reshape(rows, *prefill.shape[1:])

    rope_cos = params["pred_rope_cos"]
    rope_sin = params["pred_rope_sin"]
    h, kv = qwen3_stack_step(params["predictor"], prefill, kv, pcfg,
                             rope_cos[:2], rope_sin[:2])

    # first group: expand each request's row-0 logits into its beam
    logits0 = jnp.matmul(h.reshape(bsz, beam_size, -1)[:, 0],
                         params["lm_heads"][0])               # (B, Vg)
    st = jax.vmap(lambda lg: beam_init(lg[None], beam_size))(logits0)
    row_off = (jnp.arange(bsz) * beam_size)[:, None]          # (B, 1)
    save = jnp.zeros((rows, cfg.num_code_groups - 1), jnp.int32)
    toks = st.tokens.reshape(rows)
    save = save.at[:, 0].set(toks)
    log_probs = st.log_probs                                  # (B, beam, 1)

    def step(carry, g):
        h, kv, save, log_probs, toks = carry
        emb = params["group_embeds"][g - 1][toks][:, None]    # (rows, 1, tH)
        emb = jnp.matmul(emb, params["small_to_mtp"])
        pos = kv.length
        rc = jax.lax.dynamic_slice(rope_cos, (pos, 0), (1, pcfg.head_dim))
        rs = jax.lax.dynamic_slice(rope_sin, (pos, 0), (1, pcfg.head_dim))
        h, kv = qwen3_stack_step(params["predictor"], emb, kv, pcfg, rc, rs,
                                 fused=fused)
        logits = jnp.matmul(h, params["lm_heads"][g])         # (rows, Vg)
        if repeat_penalty != 1.0:
            logits = apply_repetition_penalty(logits, save, g,
                                              repeat_penalty, penalty_range)
        st = jax.vmap(
            lambda lg, lp: beam_step(lg, lp, beam_size, top_k)
        )(logits.reshape(bsz, beam_size, -1), log_probs)
        flat_parent = (st.parent + row_off).reshape(rows)
        kv = kv.select_batch(flat_parent)
        save = save[flat_parent].at[:, g].set(st.tokens.reshape(rows))
        return (h, kv, save, st.log_probs, st.tokens.reshape(rows)), None

    carry = (h, kv, save, log_probs, toks)
    (h, kv, save, _, _), _ = jax.lax.scan(
        step, carry, jnp.arange(1, cfg.num_code_groups - 1))

    best = save.reshape(bsz, beam_size, -1)[:, 0]             # (B, 15)
    frame_ids = jnp.concatenate([codec_token0[:, None], best], axis=1)
    return frame_ids, codec_embed0


def next_talker_input(params, frame_ids: jax.Array, codec_embed0: jax.Array,
                      trailing_text: jax.Array, gather_id: jax.Array,
                      cfg: QwenTTSConfig) -> jax.Array:
    """TTS_EMBED_C (reference :236-249): talker input for the next frame =
    codec_embed0 + trailing_text[gather_id] + sum_g predictor_embed_g."""
    emb = codec_embed0 + trailing_text[:, gather_id][:, None]   # (1, 1, tH)

    def add_group(emb, g):
        e = params["group_embeds"][g][frame_ids[g + 1]][None, None]
        return emb + e, None

    emb, _ = jax.lax.scan(add_group, emb, jnp.arange(cfg.num_code_groups - 1))
    return emb


def next_talker_input_batch(params, frame_ids: jax.Array,
                            codec_embed0: jax.Array, trailing_text: jax.Array,
                            gather_id: jax.Array,
                            cfg: QwenTTSConfig) -> jax.Array:
    """Batched TTS_EMBED_C: frame_ids (B, 16); codec_embed0 (B, 1, tH);
    trailing_text (B, Tt, tH); gather_id (B,). Returns (B, 1, tH)."""
    picked = jnp.take_along_axis(
        trailing_text, gather_id[:, None, None], axis=1)        # (B, 1, tH)
    emb = codec_embed0 + picked

    def add_group(emb, g):
        e = params["group_embeds"][g][frame_ids[:, g + 1]][:, None]
        return emb + e, None

    emb, _ = jax.lax.scan(add_group, emb, jnp.arange(cfg.num_code_groups - 1))
    return emb


# --------------------------------------------------------------------------
# Random init (tests)

def init_stack_params(cfg: Qwen3StackConfig, key: jax.Array,
                      dtype=jnp.float32, bias: bool = False):
    keys = iter(jax.random.split(key, 8 * cfg.num_layers + 4))
    hs, hd = cfg.hidden_size, cfg.head_dim
    scale = hd ** -0.25

    def mat(cin, cout, s=0.02):
        return jax.random.normal(next(keys), (cin, cout), dtype) * s

    layers = []
    for _ in range(cfg.num_layers):
        p = {
            "wqkv": mat(hs, (cfg.num_heads + 2 * cfg.num_kv_heads) * hd),
            "q_norm": jnp.full((hd,), scale, dtype),
            "k_norm": jnp.full((hd,), scale, dtype),
            "wo": mat(cfg.num_heads * hd, hs),
            "w_gate_up": mat(hs, 2 * cfg.ffn_dim),
            "w_down": mat(cfg.ffn_dim, hs),
        }
        if bias:
            p["bqkv"] = jnp.zeros(((cfg.num_heads + 2 * cfg.num_kv_heads) * hd,),
                                  dtype)
        layers.append(p)
    return {"layers": layers}


def init_talker_params(cfg: QwenTTSConfig, key: jax.Array, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))
    t = cfg.talker

    def mat(cin, cout, s=0.02):
        return jax.random.normal(next(keys), (cin, cout), dtype) * s

    rope_cos, rope_sin = rope_table(t.max_seq_len, t.head_dim, t.rope_base)
    params = init_stack_params(t, next(keys), dtype)
    return {
        "talker": params,
        "codec_head": mat(t.hidden_size, cfg.codec_vocab),
        "suppress_bias": jnp.asarray(
            make_suppress_bias(cfg.codec_vocab, cfg.codec_eos_token_id), dtype),
        "talker_codec_embed": mat(cfg.codec_vocab, t.hidden_size),
        "text_embed": mat(cfg.text_vocab, cfg.text_hidden),
        "text_proj_w": mat(cfg.text_hidden, t.hidden_size),
        "text_proj_b": jnp.zeros((t.hidden_size,), dtype),
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
    }


def init_predictor_params(cfg: QwenTTSConfig, key: jax.Array,
                          dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16))
    p = cfg.predictor
    t = cfg.talker

    def mat(*shape, s=0.02):
        return jax.random.normal(next(keys), shape, dtype) * s

    rope_cos, rope_sin = rope_table(p.max_seq_len, p.head_dim, p.rope_base)
    return {
        "predictor": init_stack_params(p, next(keys), dtype),
        "small_to_mtp": mat(t.hidden_size, p.hidden_size),
        "lm_heads": mat(cfg.num_code_groups - 1, p.hidden_size,
                        cfg.group_vocab),
        "group_embeds": mat(cfg.num_code_groups - 1, cfg.group_vocab,
                            t.hidden_size),
        "pred_rope_cos": jnp.asarray(rope_cos, dtype),
        "pred_rope_sin": jnp.asarray(rope_sin, dtype),
    }
