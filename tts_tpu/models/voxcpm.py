"""VoxCPM-1.5 — MiniCPM dual-LM + per-step CFM latent diffusion + audio VAE,
TPU-native.

Behavioral contract from the reference export wrappers
(/root/reference/VoxCPM/v1.5/Export_VoxCPM_ONNX.py):
  * VOXCPM_VAE_ENCODER (:78-118): 44.1 kHz audio left-padded to a patch
    multiple -> causal-conv VAE encoder (snake residual units, strided
    downsampling, fc_mu) -> latent patches (T, patch_size=4, latent_dim);
  * VOXCPM_FEAT_ENCODER_COND (:126-251): per-patch 5-token transformer
    (learned special token prepended) -> feat_embed for the LM; cond_proj
    of the last patch duplicated for CFG -> feat_cond;
  * VOXCPM_MAIN (:325-520): base MiniCPM LM -> norm -> FSQ bottleneck over
    audio positions -> residual LM over [text_hidden | fsq_out+feat_embed]
    -> fused lm_to_dit/stop projection + res_to_dit projection ->
    dit_hidden, stop_flag, fresh gaussian;
  * VOXCPM_FEAT_DECODER (:528-672): 10 CFM Euler steps fully unrolled; per
    step a batch-2 CFG transformer over q_len=9 = [dit_hidden+t | 4-patch
    cond | 4-patch noisy x], guidance rescaled by the st_star projection
    (dot/norm of pos·neg);
  * VOXCPM_VAE_DECODE (:679-709): causal-conv VAE decoder (noise blocks,
    snake, tanh) -> waveform.

TPU re-design: the per-step 4-session hot loop (Inference :499-552)
compiles into one lax.while_loop; the 10-step CFM is a lax.scan inside it;
all norm/scale folds happen at load (weights/voxcpm_loader.py).
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
from ..audio.snake import snake
from ..ops.conv import conv1d, conv_transpose1d
from ..quant.weight_only import dense

__all__ = [
    "VoxCPMConfig",
    "LlamaStackConfig",
    "VaeConfig",
    "vae_encode",
    "vae_decode",
    "feat_encoder_cond",
    "voxcpm_main_step",
    "cfm_feat_decoder",
    "init_params",
    "init_vae_params",
    "voxcpm_v2_config",
]


@dataclass(frozen=True)
class LlamaStackConfig:
    """MiniCPM/Llama-style stack (no q/k norm)."""

    hidden_size: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    ffn_dim: int
    num_layers: int
    rms_eps: float = 1e-5
    rope_base: float = 10000.0
    max_seq_len: int = 2048


@dataclass(frozen=True)
class VaeConfig:
    """Defaults = the upstream AudioVAEConfig
    (modeling_modified/audio_vae.py:273-281): encoder_dim 128, rates
    (2,5,8,8), decoder_dim 1536, decoder rates (8,8,5,2), depthwise
    residual convs."""

    d_model: int = 128
    latent_dim: int = 64
    strides: tuple[int, ...] = (2, 5, 8, 8)
    decoder_channels: int = 1536
    use_noise_block: bool = False
    # depthwise=True (upstream default): the k=7 conv in every residual
    # unit is grouped per channel (audio_vae.py:81-99 groups=dim)
    depthwise: bool = True
    # v2 decoder deltas (reference v2 Export:860-1005): decoder upsample
    # rates may differ from the encoder strides (16 kHz in -> 48 kHz out),
    # the init conv is depthwise+pointwise, and each block is modulated by
    # a sample-rate conditioning layer (scale/bias embeddings selected by
    # bucketized target rate)
    # When depthwise=True the decoder init conv is a depthwise k7 +
    # pointwise pair (audio_vae.py:231-241) — applies to v1.5 AND v2.
    decoder_rates: tuple[int, ...] | None = None
    sr_bins: tuple[float, ...] = ()

    @property
    def encoder_stride(self) -> int:
        return int(np.prod(self.strides))

    @property
    def decoder_stride(self) -> int:
        rates = self.decoder_rates or tuple(reversed(self.strides))
        return int(np.prod(rates))


@dataclass(frozen=True)
class VoxCPMConfig:
    """Defaults sized roughly for VoxCPM-1.5; loader overrides."""

    base: LlamaStackConfig = LlamaStackConfig(
        hidden_size=1024, num_heads=16, num_kv_heads=2, head_dim=64,
        ffn_dim=2560, num_layers=24)
    residual: LlamaStackConfig = LlamaStackConfig(
        hidden_size=1024, num_heads=16, num_kv_heads=2, head_dim=64,
        ffn_dim=2560, num_layers=4)
    feat_encoder: LlamaStackConfig = LlamaStackConfig(
        hidden_size=512, num_heads=8, num_kv_heads=2, head_dim=64,
        ffn_dim=1280, num_layers=3, max_seq_len=8)
    estimator: LlamaStackConfig = LlamaStackConfig(
        hidden_size=512, num_heads=8, num_kv_heads=2, head_dim=64,
        ffn_dim=1280, num_layers=6, max_seq_len=16)
    vae: VaeConfig = VaeConfig()
    patch_size: int = 4
    chunk_size: int = 640              # vae encoder stride per latent
    fsq_dim: int = 32
    fsq_levels: int = 9
    vocab_size: int = 73448
    audio_start_id: int = 101
    cfm_steps: int = 10
    cfm_sway: float = 1.0
    # upstream UnifiedCFM mean_mode: the delta-time embedding fed to the
    # estimator is the PER-STEP dt (mean_mode=True) or a constant 0
    # embedding (False) — reference Export_VoxCPM_ONNX.py:552-556; both
    # fold into the precomputed cfm_t_table at load (_cfm_tables)
    cfm_mean_mode: bool = False
    cfg_value: float = 2.0
    stop_act: str = "tanh"             # stop_actn nonlinearity
    sample_rate: int = 44100           # VAE input rate

    @property
    def output_sample_rate(self) -> int:
        """Native decoder output rate: the decoder's total upsample may
        exceed the encoder's stride (v2: 16 kHz in -> 48 kHz out)."""
        return self.sample_rate * self.vae.decoder_stride // self.vae.encoder_stride

    @property
    def samples_per_latent(self) -> int:
        return self.patch_size * self.vae.decoder_stride


def voxcpm_v2_config() -> "VoxCPMConfig":
    """VoxCPM-2 preset (reference v2 Export:93-101, 180-210, 860-1005):
    16 kHz VAE input with encoder strides (2,5,8,8) (chunk 640) and a
    sample-rate-conditioned decoder whose upsample totals 1920 — native
    48 kHz output, no resampling. Pass use_mup=True (+ scale_emb/
    scale_depth from the checkpoint config) to load_voxcpm for the muP
    folds. LM stack geometry must still come from the checkpoint config."""
    return VoxCPMConfig(
        sample_rate=16000,
        chunk_size=640,
        vae=VaeConfig(
            d_model=128, latent_dim=64, strides=(2, 5, 8, 8),
            decoder_channels=2048, decoder_rates=(8, 8, 6, 5),
            sr_bins=(22050.0, 44100.0),
        ),
    )


# --------------------------------------------------------------------------
# Llama-style building blocks

def llama_stack_step(params, hidden: jax.Array, kv: KVCache,
                     cfg: LlamaStackConfig, rope_cos, rope_sin,
                     kv_valid=None, fused: bool = False):
    """Causal cached step over S new positions; returns (full hidden
    sequence (B, S, H) pre-final-norm, kv). Input/post norms folded into
    qkv/gate_up at load. kv_valid: (max_T,) shared or (B, max_T) per
    batch row (batched serving). fused=True routes the decode (S=1) qkv
    head through the Pallas kernel (ops/decode_qkv.py — same math, see
    its docstring for the measured win)."""
    b, s, _ = hidden.shape
    pos = kv.length
    mask = combine_kv_valid(
        attention_mask(s, kv.max_len, pos, pos + s, causal=True), kv_valid)
    if fused and s != 1:
        raise ValueError("fused decode path requires S == 1")
    x = hidden
    q_sz = cfg.num_heads * cfg.head_dim
    kv_sz = cfg.num_kv_heads * cfg.head_dim
    if fused:
        from ..ops.decode_qkv import fusable_layout, fusable_weight

        ok = (fusable_layout(hidden.shape[0], cfg.num_heads,
                             cfg.num_kv_heads, cfg.head_dim)
              and all(fusable_weight(p["wqkv"])
                      for p in params["layers"]))
        if not ok:
            fused = False
    # "step" (qkv+attention single kernel, ops/decode_step.py) needs the
    # M=1 plain-causal geometry; degrade to the qkv head otherwise
    if fused == "step" and (b != 1 or kv_valid is not None
                            or cfg.head_dim not in (64, 128)
                            or q_sz % 128 or kv_sz % 128):
        fused = True
    for i, p in enumerate(params["layers"]):
        if fused == "step":
            from ..ops.decode_step import fused_qkv_attn

            attn_flat, kf, vf = fused_qkv_attn(
                x[:, 0], p["wqkv"], rope_cos, rope_sin, kv.k, kv.v, i,
                kv.length, heads=cfg.num_heads,
                kv_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
                bqkv=p.get("bqkv"), eps=cfg.rms_eps)
            kv, _, _ = kv.update_layer(
                i, kf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim),
                vf.reshape(b, 1, cfg.num_kv_heads, cfg.head_dim))
            out = attn_flat[:, None]
            # falls through to the one shared residual + MLP tail below
        elif fused:
            from ..ops.decode_qkv import fused_qkv_rope

            qf, kf, vf = fused_qkv_rope(
                x[:, 0], p["wqkv"], rope_cos, rope_sin,
                heads=cfg.num_heads, kv_heads=cfg.num_kv_heads,
                head_dim=cfg.head_dim, bqkv=p.get("bqkv"),
                eps=cfg.rms_eps)
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
            q = apply_rope(q, rope_cos, rope_sin)
            k = apply_rope(k, rope_cos, rope_sin)
        if fused != "step":
            kv, k_full, v_full = kv.update_layer(i, k, v)
            out = gqa_attention(q, k_full, v_full, mask).reshape(b, s, -1)
        x = x + dense(out, p["wo"])
        h = rms_norm(x, eps=cfg.rms_eps)
        gu = dense(h, p["w_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + dense(jax.nn.silu(gate) * up, p["w_down"])
    return x, kv.advance(s)


def llama_stack_nocache(params, x: jax.Array, cfg: LlamaStackConfig,
                        rope_cos, rope_sin) -> jax.Array:
    """Full (non-causal) attention over a short fixed window, batched over
    patches (feat encoder / CFM estimator; reference :218-247, :634-659)."""
    b, s, _ = x.shape
    for p in params["layers"]:
        h = rms_norm(x, eps=cfg.rms_eps)
        qkv = dense(h, p["wqkv"])
        if "bqkv" in p:
            qkv = qkv + p["bqkv"]
        q_sz = cfg.num_heads * cfg.head_dim
        kv_sz = cfg.num_kv_heads * cfg.head_dim
        q = qkv[..., :q_sz].reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = qkv[..., q_sz:q_sz + kv_sz].reshape(b, s, cfg.num_kv_heads,
                                                cfg.head_dim)
        v = qkv[..., q_sz + kv_sz:].reshape(b, s, cfg.num_kv_heads,
                                            cfg.head_dim)
        q = apply_rope(q, rope_cos, rope_sin)
        k = apply_rope(k, rope_cos, rope_sin)
        out = gqa_attention(q, k.swapaxes(1, 2), v.swapaxes(1, 2),
                            None).reshape(b, s, -1)
        x = x + dense(out, p["wo"])
        h = rms_norm(x, eps=cfg.rms_eps)
        gu = dense(h, p["w_gate_up"])
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + dense(jax.nn.silu(gate) * up, p["w_down"])
    return x


# --------------------------------------------------------------------------
# Audio VAE (modeling_modified/audio_vae.py:20-270)

def _causal_conv(x, w, b=None, pad: int = 0, stride: int = 1,
                 dilation: int = 1, groups: int = 1):
    """Left-pad 2*pad then VALID conv (audio_vae.py:20-30). x: (B, T, C)."""
    x = jnp.pad(x, ((0, 0), (2 * pad, 0), (0, 0)))
    return conv1d(x, w, b, padding=0, stride=stride, dilation=dilation,
                  groups=groups)


def _causal_conv_t(x, w, b=None, pad: int = 0, stride: int = 1,
                   output_padding: int = 0):
    """Transposed conv trimmed right by (2*pad - output_padding)
    (audio_vae.py:32-41)."""
    y = conv_transpose1d(x, w, b, stride=stride, padding=0)
    trim = 2 * pad - output_padding
    return y[:, : y.shape[1] - trim] if trim > 0 else y


def _residual_unit(x, p, dilation: int):
    pad = ((7 - 1) * dilation) // 2
    # depthwise when the stored kernel has a single input channel
    groups = x.shape[-1] if p["c1"]["w"].shape[1] == 1 else 1
    h = snake(x, p["s1"]["alpha"], p["s1"]["alpha_recip"])
    h = _causal_conv(h, p["c1"]["w"], p["c1"]["b"], pad=pad,
                     dilation=dilation, groups=groups)
    h = snake(h, p["s2"]["alpha"], p["s2"]["alpha_recip"])
    h = _causal_conv(h, p["c2"]["w"], p["c2"]["b"])
    return x + h


def vae_encode(params, audio: jax.Array, cfg: VaeConfig) -> jax.Array:
    """audio (B, N) float -> latents (B, N/total_stride, latent_dim).
    Caller pre-pads N to a multiple of the total stride."""
    x = audio[..., None]                                    # (B, N, 1)
    x = _causal_conv(x, params["pre"]["w"], params["pre"]["b"], pad=3)
    for i, stride in enumerate(cfg.strides):
        blk = params["enc_blocks"][i]
        for j, dil in enumerate((1, 3, 9)):
            x = _residual_unit(x, blk["units"][j], dil)
        x = snake(x, blk["snake"]["alpha"], blk["snake"]["alpha_recip"])
        x = _causal_conv(x, blk["down"]["w"], blk["down"]["b"],
                         pad=-(-stride // 2), stride=stride)
    return _causal_conv(x, params["fc_mu"]["w"], params["fc_mu"]["b"], pad=1)


def vae_decode(params, latents: jax.Array, cfg: VaeConfig,
               noise_key: jax.Array | None = None,
               sr_idx: jax.Array | int = 0) -> jax.Array:
    """latents (B, T, latent_dim) -> audio (B, T*decoder_stride) in [-1, 1].

    v2 variant (cfg.depthwise / sr_bins set): depthwise+pointwise init
    convs, and each block pre-modulated by the SampleRateConditionLayer
    (x*scale + bias from embeddings at sr_idx, optional snake+conv
    out_layer) — reference v2 Export:973-1005."""
    if cfg.depthwise and "pre_dw" in params:
        x = _causal_conv(latents, params["pre_dw"]["w"], params["pre_dw"]["b"],
                         pad=3, groups=latents.shape[-1])
        x = _causal_conv(x, params["pre"]["w"], params["pre"]["b"])
    else:
        x = _causal_conv(latents, params["pre"]["w"], params["pre"]["b"], pad=3)
    rates = cfg.decoder_rates or tuple(reversed(cfg.strides))
    for i, stride in enumerate(rates):
        blk = params["dec_blocks"][i]
        if "sr_scale" in blk:
            scale = blk["sr_scale"][sr_idx][None, None]
            bias = blk["sr_bias"][sr_idx][None, None]
            x = x * scale + bias
            if "sr_out_conv" in blk:
                x = snake(x, blk["sr_out_snake"]["alpha"],
                          blk["sr_out_snake"]["alpha_recip"])
                k = blk["sr_out_conv"]["w"].shape[0]
                x = _causal_conv(x, blk["sr_out_conv"]["w"],
                                 blk["sr_out_conv"].get("b"),
                                 pad=(k - 1) // 2)
        x = snake(x, blk["snake"]["alpha"], blk["snake"]["alpha_recip"])
        x = _causal_conv_t(x, blk["up"]["w"], blk["up"]["b"],
                           pad=-(-stride // 2), stride=stride,
                           output_padding=stride % 2)
        if cfg.use_noise_block and "noise" in blk:
            key = (jax.random.fold_in(noise_key, i)
                   if noise_key is not None else jax.random.key(i))
            n = jax.random.normal(key, (x.shape[0], x.shape[1], 1), x.dtype)
            x = x + n * _causal_conv(x, blk["noise"]["w"], None)
        for j, dil in enumerate((1, 3, 9)):
            x = _residual_unit(x, blk["units"][j], dil)
    x = snake(x, params["post_snake"]["alpha"], params["post_snake"]["alpha_recip"])
    x = _causal_conv(x, params["post"]["w"], params["post"]["b"], pad=3)
    return jnp.tanh(x[..., 0])


# --------------------------------------------------------------------------
# Feature encoder + conditioning (reference :126-251)

def feat_encoder_cond(params, audio_feat: jax.Array, cfg: VoxCPMConfig):
    """audio_feat (T, patch, latent) -> (feat_embed (1, T, base_H),
    feat_cond (2, patch, est_H))."""
    fe = cfg.feat_encoder
    t = audio_feat.shape[0]
    h = jnp.matmul(audio_feat, params["fe_in_proj"]["w"]) \
        + params["fe_in_proj"]["b"]                          # (T, P, H)
    sp = jnp.broadcast_to(params["fe_special"], (t, 1, fe.hidden_size))
    h = jnp.concatenate([sp, h], axis=1)                     # (T, P+1, H)
    q_len = cfg.patch_size + 1
    rope_cos = params["fe_rope_cos"][:q_len]
    rope_sin = params["fe_rope_sin"][:q_len]
    h = llama_stack_nocache(params["fe"], h, fe, rope_cos, rope_sin)
    feat = rms_norm(h[:, 0], eps=fe.rms_eps)                 # (T, H)
    feat_embed = jnp.matmul(feat, params["enc_to_lm"]["w"])
    if "b" in params["enc_to_lm"]:
        feat_embed = feat_embed + params["enc_to_lm"]["b"]
    feat_embed = feat_embed[None]                            # (1, T, base_H)

    cond = jnp.matmul(audio_feat[-1:], params["cond_proj"]["w"]) \
        + params["cond_proj"]["b"]                           # (1, P, est_H)
    feat_cond = jnp.concatenate([cond, cond], axis=0)        # (2, P, est_H)
    return feat_embed, feat_cond


def feat_encoder_cond_batch(params, audio_feat: jax.Array,
                            cfg: VoxCPMConfig):
    """Batched-serving feat encoder: audio_feat (B, patch, latent) — one
    latent per stream — -> (feat_embed (B, 1, base_H),
    feat_cond (2B, patch, est_H) laid out [pos rows | neg rows])."""
    fe = cfg.feat_encoder
    bsz = audio_feat.shape[0]
    h = jnp.matmul(audio_feat, params["fe_in_proj"]["w"]) \
        + params["fe_in_proj"]["b"]                          # (B, P, H)
    sp = jnp.broadcast_to(params["fe_special"], (bsz, 1, fe.hidden_size))
    h = jnp.concatenate([sp, h], axis=1)
    q_len = cfg.patch_size + 1
    h = llama_stack_nocache(params["fe"], h, fe,
                            params["fe_rope_cos"][:q_len],
                            params["fe_rope_sin"][:q_len])
    feat = rms_norm(h[:, 0], eps=fe.rms_eps)                 # (B, H)
    feat_embed = jnp.matmul(feat, params["enc_to_lm"]["w"])
    if "b" in params["enc_to_lm"]:
        feat_embed = feat_embed + params["enc_to_lm"]["b"]
    feat_embed = feat_embed[:, None]                         # (B, 1, base_H)

    cond = jnp.matmul(audio_feat, params["cond_proj"]["w"]) \
        + params["cond_proj"]["b"]                           # (B, P, est_H)
    feat_cond = jnp.concatenate([cond, cond], axis=0)        # (2B, P, est_H)
    return feat_embed, feat_cond


def cfm_feat_decoder_batch(params, noise: jax.Array, dit_hidden: jax.Array,
                           feat_cond: jax.Array,
                           cfg: VoxCPMConfig) -> jax.Array:
    """Batched cfm_feat_decoder: noise (B, patch, est_in); dit_hidden
    (B, 1, est_H); feat_cond (2B, patch, est_H) [pos | neg rows]. The CFG
    pair batches as 2B estimator rows; st_star rescales per row."""
    est = cfg.estimator
    bsz = noise.shape[0]
    q_len = 2 * cfg.patch_size + 1
    rope_cos = params["est_rope_cos"][:q_len]
    rope_sin = params["est_rope_sin"][:q_len]

    def step(x, i):
        t = jnp.broadcast_to(params["cfm_t_table"][i][None, None],
                             dit_hidden.shape)
        dt = params["cfm_dt"][i]
        rows = jnp.concatenate([dit_hidden + t, t], axis=0)  # (2B, 1, H)
        xin = jnp.matmul(x, params["est_in_proj"]["w"]) \
            + params["est_in_proj"]["b"]
        xin = jnp.concatenate([xin, xin], axis=0)            # (2B, P, H)
        h = jnp.concatenate([rows, feat_cond, xin], axis=1)
        h = llama_stack_nocache(params["est"], h, est, rope_cos, rope_sin)
        h = h[:, cfg.patch_size + 1:]
        h = rms_norm(h, eps=est.rms_eps)
        out = jnp.matmul(h, params["est_out_proj"]["w"])
        if "b" in params["est_out_proj"]:
            out = out + params["est_out_proj"]["b"]
        pos, neg = out[:bsz], out[bsz:]
        pf = pos.reshape(bsz, 1, -1)
        nf = neg.reshape(bsz, 1, -1)
        st_star = jnp.sum(pf * nf, -1, keepdims=True) / (
            jnp.sum(nf * nf, -1, keepdims=True) + 1e-12)      # (B, 1, 1)
        dphi = (1.0 - cfg.cfg_value) * neg * st_star + cfg.cfg_value * pos
        return x - dt * dphi, None

    x, _ = jax.lax.scan(step, noise, jnp.arange(cfg.cfm_steps - 1))
    return x


# --------------------------------------------------------------------------
# FSQ bottleneck (upstream voxcpm fsq_layer: project down, bound with tanh,
# round to a fixed grid, project back up)

def fsq_layer(params, x: jax.Array, cfg: VoxCPMConfig) -> jax.Array:
    z = jnp.matmul(x, params["fsq_down"]["w"]) + params["fsq_down"]["b"]
    half = (cfg.fsq_levels - 1) / 2.0
    z = jnp.round(jnp.tanh(z) * half) / half
    return jnp.matmul(z, params["fsq_up"]["w"]) + params["fsq_up"]["b"]


# --------------------------------------------------------------------------
# Dual-LM main step (reference :455-520)

def voxcpm_main_step(params, hidden: jax.Array, feat_embed: jax.Array,
                     concat_text_len, base_kv: KVCache, res_kv: KVCache,
                     cfg: VoxCPMConfig, valid_len=None, kv_valid=None,
                     fused: bool = False):
    """One dual-LM pass over S positions. hidden (B, S, base_H).
    concat_text_len marks audio positions: a scalar boundary (positions
    >= it are audio — the v1.5 layout), a (S,) bool mask (the v2 modes
    interleave text and audio segments), or a (B, S) bool mask (batched
    serving). Audio positions are FSQ-bottlenecked + feat_embed added
    before the residual LM; feat_embed must align with hidden.

    valid_len (scalar): true length inside a padded bucket (batched
    prefill) — the dit/stop outputs come from position valid_len-1 and the
    caller rewinds the KV lengths. kv_valid: per-row (B, max_T) key mask
    for the left-aligned serving layout.

    Returns (dit_hidden (B, 1, est_H), stop_flag (() for B=1, (B,)
    otherwise), lm state)."""
    b = cfg.base
    bsz, s, _ = hidden.shape
    pos = base_kv.length
    rope_cos = jax.lax.dynamic_slice(params["rope_cos"], (pos, 0),
                                     (s, b.head_dim))
    rope_sin = jax.lax.dynamic_slice(params["rope_sin"], (pos, 0),
                                     (s, b.head_dim))

    fused = fused and s == 1
    x, base_kv = llama_stack_step(params["base"], hidden, base_kv, b,
                                  rope_cos, rope_sin, kv_valid=kv_valid,
                                  fused=fused)
    x = rms_norm(x, params["base_norm"], eps=b.rms_eps)

    ctl = jnp.asarray(concat_text_len)
    if ctl.ndim == 2:                                       # (B, S) mask
        is_audio = ctl[:, :, None]
    elif ctl.ndim == 1:                                     # per-position mask
        is_audio = ctl[None, :, None]
    else:
        is_audio = jnp.arange(s)[None, :, None] >= ctl
    fsq_out = fsq_layer(params, x, cfg)
    mixed = jnp.where(is_audio, fsq_out, x)
    res_in = jnp.where(is_audio, fsq_out + feat_embed, x)

    r, res_kv = llama_stack_step(params["residual"], res_in, res_kv,
                                 cfg.residual, rope_cos, rope_sin,
                                 kv_valid=kv_valid, fused=fused)

    def at_last(t):
        if valid_len is None:
            return t[:, -1:]
        return jax.lax.dynamic_slice(
            t, (0, valid_len - 1, 0), (t.shape[0], 1, t.shape[2]))

    lm_hidden = at_last(mixed)                              # pre-feat add
    res_hidden = rms_norm(at_last(r), eps=cfg.residual.rms_eps)

    fused = jnp.matmul(lm_hidden, params["dit_stop"]["w"])
    if "b" in params["dit_stop"]:
        fused = fused + params["dit_stop"]["b"]
    dit_dim = cfg.estimator.hidden_size
    dit1 = fused[..., :dit_dim]
    stop_im = fused[..., dit_dim:]
    dit2 = jnp.matmul(res_hidden, params["res_to_dit"]["w"])
    dit_hidden = dit1 + dit2

    stop = jax.nn.silu(stop_im) if cfg.stop_act == "silu" else \
        jnp.tanh(stop_im)
    stop = jnp.matmul(stop, params["stop_head"]["w"]) + params["stop_head"]["b"]
    stop_flag = jnp.argmax(stop[:, -1], axis=-1).astype(jnp.int32)   # (B,)
    if bsz == 1:
        stop_flag = stop_flag[0]
    return dit_hidden, stop_flag, base_kv, res_kv


# --------------------------------------------------------------------------
# CFM feature decoder (reference :528-672) — the 10-step loop as lax.scan

def cfm_time_schedule(steps: int, sway: float = 1.0):
    t = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
    ts = (t + sway * (np.cos(np.pi / 2 * t) - 1.0 + t))[1:]
    dt = ts[:-1] - ts[1:]
    return ts.astype(np.float32), dt.astype(np.float32)


def cfm_feat_decoder(params, noise: jax.Array, dit_hidden: jax.Array,
                     feat_cond: jax.Array, cfg: VoxCPMConfig) -> jax.Array:
    """noise (1, patch, est_in) -> latent patch (1, patch, est_in).

    Per Euler step: batch-2 CFG over [dit_hidden(+t) | feat_cond | x] with
    st_star-rescaled guidance (reference :638-665). t_table/dt are
    precomputed at load (params['cfm_t_table'] (steps-1, est_H),
    params['cfm_dt'] (steps-1,))."""
    est = cfg.estimator
    q_len = 2 * cfg.patch_size + 1
    rope_cos = params["est_rope_cos"][:q_len]
    rope_sin = params["est_rope_sin"][:q_len]

    def step(x, i):
        t = params["cfm_t_table"][i][None, None]            # (1, 1, H)
        dt = params["cfm_dt"][i]
        row0 = dit_hidden + t
        rows = jnp.concatenate([row0, t], axis=0)           # (2, 1, H)
        xin = jnp.matmul(x, params["est_in_proj"]["w"]) \
            + params["est_in_proj"]["b"]                    # (1, P, H)
        xin = jnp.concatenate([xin, xin], axis=0)           # (2, P, H)
        h = jnp.concatenate([rows, feat_cond, xin], axis=1) # (2, 9, H)
        h = llama_stack_nocache(params["est"], h, est, rope_cos, rope_sin)
        h = h[:, cfg.patch_size + 1:]
        h = rms_norm(h, eps=est.rms_eps)
        out = jnp.matmul(h, params["est_out_proj"]["w"])
        if "b" in params["est_out_proj"]:
            out = out + params["est_out_proj"]["b"]
        pos, neg = out[:1], out[1:]
        pf = pos.reshape(1, 1, -1)
        nf = neg.reshape(1, 1, -1)
        st_star = jnp.sum(pf * nf, -1, keepdims=True) / (
            jnp.sum(nf * nf, -1, keepdims=True) + 1e-12)
        dphi = ((1.0 - cfg.cfg_value) * neg * st_star
                + cfg.cfg_value * pos)
        return x - dt * dphi, None

    x, _ = jax.lax.scan(step, noise, jnp.arange(cfg.cfm_steps - 1))
    return x


# --------------------------------------------------------------------------
# Random init (tests)

def _init_llama_stack(cfg: LlamaStackConfig, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8 * cfg.num_layers))
    hs, hd = cfg.hidden_size, cfg.head_dim
    scale = hd ** -0.25

    def mat(cin, cout, s=0.02):
        return jax.random.normal(next(keys), (cin, cout), dtype) * s

    layers = []
    for _ in range(cfg.num_layers):
        wq = mat(hs, cfg.num_heads * hd) * scale
        wk = mat(hs, cfg.num_kv_heads * hd) * scale
        wv = mat(hs, cfg.num_kv_heads * hd)
        layers.append({
            "wqkv": jnp.concatenate([wq, wk, wv], axis=-1),
            "wo": mat(cfg.num_heads * hd, hs),
            "w_gate_up": mat(hs, 2 * cfg.ffn_dim),
            "w_down": mat(cfg.ffn_dim, hs),
        })
    return {"layers": layers}


def init_vae_params(cfg: VaeConfig, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 1024))

    def mat(*shape, s=0.1):
        return jax.random.normal(next(keys), shape, dtype) * s

    def conv_p(k, cin, cout):
        return {"w": mat(k, cin, cout), "b": jnp.zeros((cout,), dtype)}

    def snake_p(c):
        return {"alpha": jnp.ones((c,), dtype),
                "alpha_recip": jnp.ones((c,), dtype)}

    def unit(c):
        cin = 1 if cfg.depthwise else c
        return {"s1": snake_p(c), "c1": conv_p(7, cin, c),
                "s2": snake_p(c), "c2": conv_p(1, c, c)}

    d = cfg.d_model
    enc_blocks = []
    for s in cfg.strides:
        cin, cout = d, d * 2
        enc_blocks.append({
            "units": [unit(cin) for _ in range(3)],
            "snake": snake_p(cin),
            "down": conv_p(2 * s, cin, cout),
        })
        d = cout
    enc_dim = d

    dc = cfg.decoder_channels
    dec_rates = cfg.decoder_rates or tuple(reversed(cfg.strides))
    n_bins = len(cfg.sr_bins) + 1
    dec_blocks = []
    cin = dc
    for s in dec_rates:
        cout = cin // 2
        blk = {
            "snake": snake_p(cin),
            "up": conv_p(2 * s, cin, cout),
            "units": [unit(cout) for _ in range(3)],
        }
        if cfg.use_noise_block:
            blk["noise"] = {"w": mat(1, cout, cout)}
        if cfg.sr_bins:
            blk["sr_scale"] = jnp.ones((n_bins, cin), dtype)
            blk["sr_bias"] = jnp.zeros((n_bins, cin), dtype)
        dec_blocks.append(blk)
        cin = cout
    dec = {
        "pre": (conv_p(1, cfg.latent_dim, dc) if cfg.depthwise
                else conv_p(7, cfg.latent_dim, dc)),
        "dec_blocks": dec_blocks,
        "post_snake": snake_p(cin),
        "post": conv_p(7, cin, 1),
    }
    if cfg.depthwise:
        dec["pre_dw"] = {"w": mat(7, 1, cfg.latent_dim),
                         "b": jnp.zeros((cfg.latent_dim,), dtype)}
    return {
        "pre": conv_p(7, 1, cfg.d_model),
        "enc_blocks": enc_blocks,
        "fc_mu": conv_p(3, enc_dim, cfg.latent_dim),
        # decoder params live under the same pytree for simplicity; the
        # decoder's own pre conv maps latent -> channels
        "dec": dec,
    }


def init_params(cfg: VoxCPMConfig, key, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))

    def mat(*shape, s=0.02):
        return jax.random.normal(next(keys), shape, dtype) * s

    def lin(cin, cout):
        return {"w": mat(cin, cout), "b": jnp.zeros((cout,), dtype)}

    b, r = cfg.base, cfg.residual
    fe, est = cfg.feat_encoder, cfg.estimator
    rope_cos, rope_sin = rope_table(b.max_seq_len, b.head_dim, b.rope_base)
    fe_cos, fe_sin = rope_table(fe.max_seq_len, fe.head_dim, fe.rope_base)
    est_cos, est_sin = rope_table(est.max_seq_len, est.head_dim, est.rope_base)
    ts, dts = cfm_time_schedule(cfg.cfm_steps, cfg.cfm_sway)
    params = {
        "embed": mat(cfg.vocab_size, b.hidden_size),
        "base": _init_llama_stack(b, next(keys), dtype),
        "base_norm": jnp.ones((b.hidden_size,), dtype),
        "residual": _init_llama_stack(r, next(keys), dtype),
        "fsq_down": lin(b.hidden_size, cfg.fsq_dim),
        "fsq_up": lin(cfg.fsq_dim, b.hidden_size),
        "dit_stop": lin(b.hidden_size, est.hidden_size + 32),
        "res_to_dit": {"w": mat(r.hidden_size, est.hidden_size)},
        "stop_head": lin(32, 2),
        "fe": _init_llama_stack(fe, next(keys), dtype),
        "fe_in_proj": lin(cfg.vae.latent_dim, fe.hidden_size),
        "fe_special": mat(1, fe.hidden_size),
        "enc_to_lm": lin(fe.hidden_size, b.hidden_size),
        "cond_proj": lin(cfg.vae.latent_dim, est.hidden_size),
        "est": _init_llama_stack(est, next(keys), dtype),
        "est_in_proj": lin(cfg.vae.latent_dim, est.hidden_size),
        "est_out_proj": lin(est.hidden_size, cfg.vae.latent_dim),
        "cfm_t_table": mat(cfg.cfm_steps - 1, est.hidden_size),
        "cfm_dt": jnp.asarray(dts, dtype),
        "rope_cos": jnp.asarray(rope_cos, dtype),
        "rope_sin": jnp.asarray(rope_sin, dtype),
        "fe_rope_cos": jnp.asarray(fe_cos, dtype),
        "fe_rope_sin": jnp.asarray(fe_sin, dtype),
        "est_rope_cos": jnp.asarray(est_cos, dtype),
        "est_rope_sin": jnp.asarray(est_sin, dtype),
    }
    return params
