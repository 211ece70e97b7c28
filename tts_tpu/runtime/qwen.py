"""Qwen3-TTS synthesis pipeline: the two-level talker/predictor decode.

Reference behavior: /root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py
:2622-2732 (outer talker loop) + :2485-2597 (predictor_steps inner loop) —
~60 ONNX session calls per talker frame. Here ONE lax.while_loop runs the
full frame step: talker decode -> greedy token0 (with suppress bias and
repetition penalty) -> 15-group predictor scan (stacked LM heads/embeds) ->
TTS_EMBED_C next-input assembly. The codec decode (models/qwen_codec.py)
is a second jitted program, bucketed by frame count.

Prefill embeddings are assembled host-side per mode (TTS_PREPROCESS
:592-692) and fed token-serially through the same talker step so one
compiled program serves every prompt length.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..decoding.sampling import apply_repetition_penalty
from ..kv.cache import KVCache
from ..models.qwen_codec import QwenCodecDecoderConfig, codec_decode
from ..models.qwen_tts import (
    QwenTTSConfig,
    next_talker_input,
    predictor_frame,
    qwen3_stack_step,
    talker_logits,
)

__all__ = ["QwenTTSPipeline", "QwenDecodeConfig", "LANGUAGE_ID_MAP",
           "SPEAKER_ID_MAP", "resolve_voice"]

# Token-id maps from the Qwen3-TTS checkpoint's talker_config
# (reference Export_Qwen_TTS_ONNX.py:1955-1995; values are model metadata)
LANGUAGE_ID_MAP = {
    "english": 2050, "german": 2053, "spanish": 2054, "chinese": 2055,
    "japanese": 2058, "french": 2061, "korean": 2064, "russian": 2069,
    "italian": 2070, "portuguese": 2071,
}
SPEAKER_ID_MAP = {
    "serena": 3066, "vivian": 3065, "uncle_fu": 3010, "ryan": 3061,
    "aiden": 2861, "ono_anna": 2873, "sohee": 2864, "eric": 2875,
    "dylan": 2878,
}
# speakers locked to a dialect language id (custom_voice mode)
_SPEAKER_DIALECT = {"eric": 2062, "dylan": 2074}   # sichuan / beijing


def resolve_voice(language: str, speaker: str | None = None
                  ) -> tuple[int, int | None]:
    """(language name, optional speaker name) -> (language_id, speaker_id),
    applying the per-speaker dialect override the reference applies for
    custom_voice (Export_Qwen_TTS_ONNX.py:1993-2003)."""
    lang_id = LANGUAGE_ID_MAP[language.lower()]
    spk_id = None
    if speaker is not None:
        key = speaker.lower()
        spk_id = SPEAKER_ID_MAP[key]
        lang_id = _SPEAKER_DIALECT.get(key, lang_id)
    return lang_id, spk_id


MAX_PREFILL = 512


def _check_special_ids(vocab: int, cfg) -> None:
    """Fail loudly if the text-embedding table can't hold the special ids.

    A mis-sized table would otherwise silently remap tts_bos/eos/pad onto
    arbitrary rows (the round-1 silent-fallback failure mode)."""
    for name in ("tts_bos_token_id", "tts_eos_token_id", "tts_pad_token_id"):
        tid = getattr(cfg, name)
        if not 0 <= tid < vocab:
            raise ValueError(
                f"{name}={tid} is out of range for the loaded text embedding "
                f"table (vocab={vocab}); the checkpoint and config disagree")


@dataclass(frozen=True)
class QwenDecodeConfig:
    max_frames: int = 600
    repeat_penalty: float = 0.9
    penalty_range: int = 10
    # predictor beam search (reference USE_BEAM_SEARCH,
    # Export_Qwen_TTS_ONNX.py:2528-2552); beam_size <= 1 keeps the greedy
    # scan. Degenerate settings fall back to greedy with a warning at
    # pipeline construction (reference :2122-2127 behavior).
    use_beam: bool = False
    beam_size: int = 3
    beam_top_k: int = 3
    # Pallas fused decode-layer kernels. None = auto: "step" (qkv head +
    # GQA attention in one kernel, ops/decode_step.py — int8 talker step
    # 1.081 -> 0.878 ms; degrades per-call to the qkv head on geometries
    # the step kernel doesn't cover, e.g. batched serving rows) on TPU
    # backends, off on CPU where the kernels would need interpret mode.
    # True = qkv head only (ops/decode_qkv.py).
    fused_decode: bool | str | None = None


class QwenTTSPipeline:
    """params: merged talker+predictor pytree (init_talker_params |
    init_predictor_params | loaders); codec_params/cfg for the 12 Hz
    decoder."""

    def __init__(self, params, cfg: QwenTTSConfig, codec_params,
                 codec_cfg: QwenCodecDecoderConfig,
                 decode_cfg: QwenDecodeConfig | None = None,
                 output_sample_rate: int = 24000,
                 quantize: int | None = None, mesh=None):
        if quantize:
            # talker + predictor LM matmuls only; the codec decoder and the
            # stacked lm_heads/group_embeds stay float (heads are (15,H,V)
            # 3-D stacks read once per frame — not the bandwidth hot spot)
            from ..quant.weight_only import quantize_pytree

            params = quantize_pytree(params, bits=quantize)
        if mesh is not None:
            # data-parallel serving: params replicated, batched entry
            # points shard their request batch over the mesh "dp" axis
            from ..parallel.mesh import replicate

            params = replicate(params, mesh)
            codec_params = replicate(codec_params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.codec_params = codec_params
        self.codec_cfg = codec_cfg
        self.dcfg = decode_cfg or QwenDecodeConfig()
        if self.dcfg.use_beam and (self.dcfg.beam_size < 2
                                   or self.dcfg.beam_top_k < 1):
            # degenerate beam settings fall back to greedy with a warning
            # (reference Export_Qwen_TTS_ONNX.py:2122-2127)
            import warnings

            warnings.warn("degenerate beam settings "
                          f"(beam_size={self.dcfg.beam_size}, "
                          f"top_k={self.dcfg.beam_top_k}); using greedy")
            self.dcfg = QwenDecodeConfig(
                **{**self.dcfg.__dict__, "use_beam": False})
        self.output_sample_rate = output_sample_rate
        fd = self.dcfg.fused_decode
        self._fused = ("step" if jax.default_backend() == "tpu" else False) \
            if fd is None else fd
        self._decode_fn = None
        self._codec_cache: dict = {}

    def _predictor(self, params, hid, tok0, cfg):
        """Greedy scan or beam search over the 15 predictor groups,
        per decode config."""
        if self.dcfg.use_beam:
            from ..models.qwen_tts import predictor_frame_beam

            return predictor_frame_beam(
                params, hid, tok0, cfg, self.dcfg.beam_size,
                self.dcfg.beam_top_k, self.dcfg.repeat_penalty,
                self.dcfg.penalty_range, fused=self._fused)
        return predictor_frame(params, hid, tok0, cfg,
                               self.dcfg.repeat_penalty,
                               self.dcfg.penalty_range, fused=self._fused)

    def _predictor_batch(self, params, hid, tok0, cfg, bsz: int):
        """Batched predictor: greedy scan, or per-request beams as (B*beam)
        rows (models/qwen_tts.predictor_frame_beam_batch). Returns
        frame_ids (B, 16), codec_embed0 (B, 1, tH)."""
        if self.dcfg.use_beam:
            from ..models.qwen_tts import predictor_frame_beam_batch

            return predictor_frame_beam_batch(
                params, hid, tok0, cfg, self.dcfg.beam_size,
                self.dcfg.beam_top_k, self.dcfg.repeat_penalty,
                self.dcfg.penalty_range, fused=self._fused)
        frame_ids, ce0 = predictor_frame(params, hid, tok0, cfg,
                                         self.dcfg.repeat_penalty,
                                         self.dcfg.penalty_range,
                                         fused=self._fused)
        # predictor_frame squeezes to (16,) at B=1; keep (B, 16)
        return frame_ids.reshape(bsz, cfg.num_code_groups), ce0

    # ------------------------------------------------------------- prefill

    def build_prefill_embeds(self, text_ids: np.ndarray,
                             language_id: int,
                             speaker_id: int | None = None,
                             ref_text_ids: np.ndarray | None = None,
                             instruct_ids: np.ndarray | None = None
                             ) -> tuple[np.ndarray, np.ndarray]:
        """Assemble the talker prefill (TTS_PREPROCESS._forward_default,
        :648-668, custom_voice layout with empty ref codec): role header is
        approximated by the codec prefix alone (role-header ids require the
        HF processor; loaders attach them when available).

        Returns (prefill (1, P, H) np.float32, trailing_text (1, Tt, H))."""
        p = self.params
        cfg = self.cfg

        def text_embed(ids):
            e = np.asarray(p["text_embed"])[ids]               # (1, T, text_H)
            return e @ np.asarray(p["text_proj_w"]) + np.asarray(p["text_proj_b"])

        def codec_embed(ids):
            return np.asarray(p["talker_codec_embed"])[np.asarray(ids)]

        # special TEXT token embeddings (TTS_PREPROCESS :606-607)
        _check_special_ids(np.asarray(p["text_embed"]).shape[0], cfg)
        tts_bos = text_embed(np.array([[cfg.tts_bos_token_id]]))
        tts_eos = text_embed(np.array([[cfg.tts_eos_token_id]]))
        tts_pad = text_embed(np.array([[cfg.tts_pad_token_id]]))

        target = text_embed(text_ids)
        texts = [target, tts_eos]
        if ref_text_ids is not None:
            texts.insert(0, text_embed(ref_text_ids))
        text_seq = np.concatenate(texts, axis=1)

        think = codec_embed([[cfg.codec_think_id, cfg.codec_think_bos_id]])
        lang = codec_embed([[language_id]])
        eos = codec_embed([[cfg.codec_think_eos_id]])
        pad = codec_embed([[cfg.codec_pad_id]])
        bos = codec_embed([[cfg.codec_bos_id]])
        parts = [think, lang, eos]
        if speaker_id is not None:
            parts.append(codec_embed([[speaker_id]]))
        parts.append(pad)
        codec_prefix = np.concatenate(parts, axis=1)
        # tts special-token overlay: pad*(n) + bos aligned on the prefix
        n = codec_prefix.shape[1]
        overlay = np.concatenate([np.repeat(tts_pad, n - 1, axis=1), tts_bos],
                                 axis=1)
        codec_prefix = codec_prefix + overlay[:, :n]

        # interleave: first text token + codec bos starts generation
        first = text_seq[:, :1] + codec_embed([[cfg.codec_bos_id]])
        prefill = np.concatenate([codec_prefix, first], axis=1)
        if instruct_ids is not None:
            # custom_voice style instruction / voice_design description:
            # tokenized "<|im_start|>system\n...<|im_end|>\n" embeds prepended
            # before the preprocess output (reference :2610-2648)
            prefill = np.concatenate([text_embed(instruct_ids), prefill],
                                     axis=1)
        trailing = np.concatenate([text_seq[:, 1:], tts_pad], axis=1)
        return prefill.astype(np.float32), trailing.astype(np.float32)

    # -------------------------------------------------------------- decode

    def _build_decode(self, trailing_len: int):
        cfg, dcfg = self.cfg, self.dcfg
        t = cfg.talker

        def run(params, prefill_buf, prefill_len, trailing):
            dt = params["talker_codec_embed"].dtype
            prefill_buf = prefill_buf.astype(dt)
            trailing = trailing.astype(dt)
            # KV bucketed to what this program can actually reach (prefill
            # bucket + frame cap) instead of the full max_seq_len: decode
            # attention reads the whole static buffer every step, so a
            # 2048 buffer costs ~0.8 ms/step of pure dead reads at
            # typical lengths (measured on the 0.6B talker)
            kv_max = min(t.max_seq_len,
                         -(-(prefill_buf.shape[1] + dcfg.max_frames + 1)
                           // 128) * 128)
            kv = KVCache.create(t.num_layers, 1, t.num_kv_heads,
                                kv_max, t.head_dim, dt)

            # batched prefill: one pass over the whole padded bucket (the
            # serial loop paid per-position launch overhead); the cache is
            # then rewound to the true length so decode appends there with
            # true rope positions, overwriting the padded garbage
            s_buf = prefill_buf.shape[1]
            hid_all, kv = qwen3_stack_step(
                params["talker"], prefill_buf, kv, t,
                params["rope_cos"][:s_buf], params["rope_sin"][:s_buf],
                return_all=True)
            hid = jax.lax.dynamic_slice(
                hid_all, (0, prefill_len - 1, 0),
                (1, 1, t.hidden_size))[:, 0]
            kv = kv.rewind(prefill_len)

            frames = jnp.zeros((dcfg.max_frames, cfg.num_code_groups),
                               jnp.int32)
            save0 = jnp.zeros((1, dcfg.max_frames), jnp.int32)
            trailing_minus = trailing.shape[1] - 1

            def cond(c):
                _, _, _, _, num, fin = c
                return (~fin) & (num < dcfg.max_frames)

            def body(c):
                kv, hid, frames, save0, num, _ = c
                logits = talker_logits(params, hid, cfg)
                if dcfg.repeat_penalty != 1.0:
                    logits = apply_repetition_penalty(
                        logits, save0, num, dcfg.repeat_penalty,
                        dcfg.penalty_range)
                tok0 = jnp.argmax(logits, -1).astype(jnp.int32)   # (1,)
                fin = (tok0[0] == cfg.codec_eos_token_id)
                save0 = jax.lax.dynamic_update_slice(save0, tok0[:, None],
                                                     (0, num))

                frame_ids, ce0 = self._predictor(params, hid[:, None],
                                                 tok0, cfg)
                frames = frames.at[num].set(frame_ids)

                gather = jnp.minimum(num, trailing_minus)
                nxt = next_talker_input(params, frame_ids, ce0,
                                        trailing, gather, cfg)
                pos = kv.length
                rc = jax.lax.dynamic_slice(params["rope_cos"], (pos, 0),
                                           (1, t.head_dim))
                rs = jax.lax.dynamic_slice(params["rope_sin"], (pos, 0),
                                           (1, t.head_dim))
                hid, kv = qwen3_stack_step(params["talker"], nxt, kv, t,
                                           rc, rs, fused=self._fused)
                return kv, hid, frames, save0, num + 1, fin

            init = (kv, hid, frames, save0, jnp.zeros((), jnp.int32),
                    jnp.zeros((), bool))
            _, _, frames, _, num, fin = jax.lax.while_loop(cond, body, init)
            # the EOS frame itself is dropped
            return frames, num - fin.astype(jnp.int32)

        return jax.jit(run)

    def _build_decode_batch(self, bsz: int):
        """Batched serving: B prefills right-justified in one bucket (rope
        attention sees only relative offsets; per-row kv_valid masks the
        left pad), per-row stop tracking, batched predictor frames (greedy
        scan, or per-request beams as (B*beam) rows when use_beam)."""
        cfg, dcfg = self.cfg, self.dcfg
        t = cfg.talker
        from ..models.qwen_tts import next_talker_input_batch

        def run(params, prefill_buf, pad_start, trailing):
            dt = params["talker_codec_embed"].dtype
            prefill_buf = prefill_buf.astype(dt)
            trailing = trailing.astype(dt)
            s_buf = prefill_buf.shape[1]
            valid = (jnp.arange(s_buf)[None, :] >= pad_start[:, None])
            prefill_buf = prefill_buf * valid[..., None]
            kv_max = min(t.max_seq_len,
                         -(-(s_buf + dcfg.max_frames + 1) // 128) * 128)
            kv = KVCache.create(t.num_layers, bsz, t.num_kv_heads,
                                kv_max, t.head_dim, dt)
            kv_idx = jnp.arange(kv_max)[None, :]
            kv_valid = kv_idx >= pad_start[:, None]          # (B, maxT)

            hid_all, kv = qwen3_stack_step(
                params["talker"], prefill_buf, kv, t,
                params["rope_cos"][:s_buf], params["rope_sin"][:s_buf],
                kv_valid=kv_valid, return_all=True)
            hid = hid_all[:, -1]                              # (B, H)

            frames = jnp.zeros((bsz, dcfg.max_frames, cfg.num_code_groups),
                               jnp.int32)
            save0 = jnp.zeros((bsz, dcfg.max_frames), jnp.int32)
            trailing_minus = trailing.shape[1] - 1

            def cond(c):
                _, _, _, _, num, fin, _ = c
                return (~fin.all()) & (num < dcfg.max_frames)

            def body(c):
                kv, hid, frames, save0, num, fin, done = c
                logits = talker_logits(params, hid, cfg)      # (B, V)
                if dcfg.repeat_penalty != 1.0:
                    logits = apply_repetition_penalty(
                        logits, save0, num, dcfg.repeat_penalty,
                        dcfg.penalty_range)
                tok0 = jnp.argmax(logits, -1).astype(jnp.int32)  # (B,)
                newly = (tok0 == cfg.codec_eos_token_id) & (~fin)
                done = jnp.where(newly, num, done)
                fin = fin | newly
                tok0 = jnp.where(fin, cfg.codec_pad_id, tok0)
                save0 = jax.lax.dynamic_update_slice(save0, tok0[:, None],
                                                     (0, num))

                frame_ids, ce0 = self._predictor_batch(
                    params, hid[:, None], tok0, cfg, bsz)
                frames = jax.lax.dynamic_update_slice(
                    frames, frame_ids[:, None, :], (0, num, 0))

                gather = jnp.minimum(jnp.full((bsz,), num), trailing_minus)
                nxt = next_talker_input_batch(params, frame_ids, ce0,
                                              trailing, gather, cfg)
                pos = kv.length
                rc = jax.lax.dynamic_slice(params["rope_cos"], (pos, 0),
                                           (1, t.head_dim))
                rs = jax.lax.dynamic_slice(params["rope_sin"], (pos, 0),
                                           (1, t.head_dim))
                hid, kv = qwen3_stack_step(params["talker"], nxt, kv, t,
                                           rc, rs, kv_valid=kv_valid,
                                           fused=self._fused)
                return kv, hid, frames, save0, num + 1, fin, done

            done0 = jnp.full((bsz,), dcfg.max_frames, jnp.int32)
            init = (kv, hid, frames, save0, jnp.zeros((), jnp.int32),
                    jnp.zeros((bsz,), bool), done0)
            _, _, frames, _, num, fin, done = jax.lax.while_loop(
                cond, body, init)
            return frames, jnp.minimum(done, num)

        return jax.jit(run)

    def _codec_fn(self, frames: int):
        if frames not in self._codec_cache:
            ccfg = self.codec_cfg

            @jax.jit
            def run(codec_params, codes):
                wav = codec_decode(codec_params, codes, ccfg)
                return (wav * 32767.0).astype(jnp.int16)

            self._codec_cache[frames] = run
        return self._codec_cache[frames]

    def _codec_dev_fn(self, fb: int, nlive: int | None = None):
        """Codec stage fed from the DEVICE-resident decode frame buffer:
        slices the first fb frames in-graph and zeroes frames past the
        per-stream count — identical to the old host crop+zero-pad+re-upload
        round trips, minus the tunnel latency. nlive=None: single stream
        (frames (max_frames, G), num scalar); else batched (frames
        (B, max_frames, G), rows (nlive,), nfr (nlive,))."""
        key = (fb, "dev", nlive)
        if key not in self._codec_cache:
            ccfg = self.codec_cfg

            if nlive is None:
                @jax.jit
                def run(codec_params, frames, num):
                    codes = frames[None, :fb] * (jnp.arange(fb)
                                                 < num)[None, :, None]
                    wav = codec_decode(codec_params, codes, ccfg)
                    return (wav * 32767.0).astype(jnp.int16)
            else:
                @jax.jit
                def run(codec_params, frames, rows, nfr):
                    codes = jnp.take(frames, rows, axis=0)[:, :fb]
                    codes = codes * (jnp.arange(fb)[None, :]
                                     < nfr[:, None])[..., None]
                    wav = codec_decode(codec_params, codes, ccfg)
                    return (wav * 32767.0).astype(jnp.int16)

            self._codec_cache[key] = run
        return self._codec_cache[key]

    def encode_reference(self, audio: np.ndarray, encoder_params,
                         encoder_cfg, speaker_params=None,
                         speaker_cfg=None, mel=None):
        """voice_clone prompt side (TTS_ENCODER :540-589): 24 kHz audio ->
        (ref_codes (T, groups), speaker_embed (1, 1, H) or None).

        speaker_params/cfg reuse the ECAPA math from models/indextts; mel is
        a MelSpectrogram configured with the slaney fbank the reference uses
        (:446)."""
        from ..models.qwen_encoder import mimi_encode, rvq_encode

        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        bucket = max(1, -(-len(audio) // 19200)) * 19200
        buf = np.pad(audio.reshape(-1), (0, bucket - len(audio)))[None]

        @jax.jit
        def enc(params, a):
            emb = mimi_encode(params, a, encoder_cfg)
            return rvq_encode(params, emb, encoder_cfg,
                              self.cfg.num_code_groups)

        codes = np.asarray(enc(encoder_params, jnp.asarray(buf)))[0]
        spk = None
        if speaker_params is not None and mel is None:
            # the reference speaker-mel contract (TTS_ENCODER,
            # Export_Qwen_TTS_ONNX.py:445,588,1394): 1024/256 stft_B with
            # constant center pad, 128-band slaney/slaney fbank,
            # log(mel + 1e-5)
            from ..audio.mel import MelSpectrogram

            mel = MelSpectrogram(24000, 1024, 256, 1024, 128,
                                 mel_scale="slaney", norm="slaney",
                                 pad_mode="constant", log_mode="add")
        if speaker_params is not None:
            from ..models.indextts import ecapa_speaker_encoder

            m = mel(jnp.asarray(buf))
            # Qwen's speaker encoder is the BatchNorm-free reflect-padded
            # ECAPA variant (modeling_qwen3_tts.py:227-248); the loader
            # emits no "bn" entries for it (qwen_speaker_from_state_dict)
            qwen_variant = "bn" not in speaker_params["block0"]
            spk = np.asarray(ecapa_speaker_encoder(
                speaker_params, m, speaker_cfg,
                reflect_pad=qwen_variant,
                std_clip=None if qwen_variant else 1e-6))
        return codes, spk

    def build_prefill_voice_clone(self, text_ids: np.ndarray,
                                  ref_text_ids: np.ndarray,
                                  language_id: int,
                                  ref_codes: np.ndarray,
                                  speaker_embed: np.ndarray
                                  ) -> tuple[np.ndarray, np.ndarray]:
        """voice_clone layout (TTS_PREPROCESS._forward_default :648-668 with
        ref codec): the reference-audio codec frames interleave with the
        text, the x-vector speaker embedding sits in the codec prefix.

        ref_codes: (T, num_code_groups) from the Mimi encoder
        (models/qwen_encoder.rvq_encode); speaker_embed: (1, 1, H)."""
        p = self.params
        cfg = self.cfg

        def text_embed(ids):
            e = np.asarray(p["text_embed"])[ids]
            return e @ np.asarray(p["text_proj_w"]) + np.asarray(p["text_proj_b"])

        def codec_embed(ids):
            return np.asarray(p["talker_codec_embed"])[np.asarray(ids)]

        _check_special_ids(np.asarray(p["text_embed"]).shape[0], cfg)
        tts_bos = text_embed(np.array([[cfg.tts_bos_token_id]]))
        tts_eos = text_embed(np.array([[cfg.tts_eos_token_id]]))
        tts_pad = text_embed(np.array([[cfg.tts_pad_token_id]]))

        # per-frame ref codec embedding: group-0 talker table + the 15
        # predictor group tables (the reference's Embed_B + Embed_C sum)
        group_embeds = np.asarray(p["group_embeds"])
        ref_emb = codec_embed(ref_codes[:, 0])[None]          # (1, T, H)
        for g in range(cfg.num_code_groups - 1):
            ref_emb = ref_emb + group_embeds[g][ref_codes[:, g + 1]][None]

        codec_seq = np.concatenate(
            [codec_embed([[cfg.codec_bos_id]]), ref_emb], axis=1)
        codec_len = codec_seq.shape[1]

        text_seq = np.concatenate(
            [text_embed(ref_text_ids), text_embed(text_ids), tts_eos], axis=1)
        if text_seq.shape[1] < codec_len:
            pad_n = codec_len - text_seq.shape[1]
            text_seq = np.concatenate(
                [text_seq, np.repeat(tts_pad, pad_n, axis=1)], axis=1)

        think = codec_embed([[cfg.codec_think_id, cfg.codec_think_bos_id]])
        lang = codec_embed([[language_id]])
        eos = codec_embed([[cfg.codec_think_eos_id]])
        pad = codec_embed([[cfg.codec_pad_id]])
        prefix = np.concatenate(
            [think, lang, eos, np.asarray(speaker_embed), pad], axis=1)
        n = prefix.shape[1]
        overlay = np.concatenate(
            [np.repeat(tts_pad, n - 1, axis=1), tts_bos], axis=1)
        prefix = prefix + overlay

        icl = text_seq[:, :codec_len] + codec_seq
        prefill = np.concatenate([prefix, icl], axis=1)
        trailing = np.concatenate([text_seq[:, codec_len:], tts_pad], axis=1)
        return prefill.astype(np.float32), trailing.astype(np.float32)

    # --------------------------------------------------- streaming decode

    def _build_prefill(self):
        cfg = self.cfg
        t = cfg.talker

        def run(params, prefill_buf, prefill_len):
            dt = params["talker_codec_embed"].dtype
            prefill_buf = prefill_buf.astype(dt)
            # bucket to the reachable length: this cache feeds the chunked
            # streaming decode, which appends at most max_frames positions
            # after the prefill (see _build_decode bucketing note)
            kv_max = min(t.max_seq_len,
                         -(-(prefill_buf.shape[1] + self.dcfg.max_frames + 1)
                           // 128) * 128)
            kv = KVCache.create(t.num_layers, 1, t.num_kv_heads,
                                kv_max, t.head_dim, dt)

            # batched prefill: one pass over the whole padded bucket (the
            # serial loop paid per-position launch overhead); the cache is
            # then rewound to the true length so decode appends there with
            # true rope positions, overwriting the padded garbage
            s_buf = prefill_buf.shape[1]
            hid_all, kv = qwen3_stack_step(
                params["talker"], prefill_buf, kv, t,
                params["rope_cos"][:s_buf], params["rope_sin"][:s_buf],
                return_all=True)
            hid = jax.lax.dynamic_slice(
                hid_all, (0, prefill_len - 1, 0),
                (1, 1, t.hidden_size))[:, 0]
            kv = kv.rewind(prefill_len)
            return kv, hid

        return jax.jit(run)

    def _build_chunk(self, chunk: int):
        """One jitted while_loop generating up to `chunk` frames; the carry
        round-trips so chunks stream while the codec decodes prior windows
        (XLA dispatch is async — this is the TPU-native analog of the
        reference's executor overlap)."""
        cfg, dcfg = self.cfg, self.dcfg
        t = cfg.talker

        def run(params, kv, hid, save0, trailing, num, total_budget):
            trailing = trailing.astype(params["talker_codec_embed"].dtype)
            frames = jnp.zeros((chunk, cfg.num_code_groups), jnp.int32)
            trailing_minus = trailing.shape[1] - 1

            def cond(c):
                _, _, _, _, n_in, num, fin = c
                return (~fin) & (n_in < chunk) & (num < total_budget)

            def body(c):
                kv, hid, frames, save0, n_in, num, _ = c
                logits = talker_logits(params, hid, cfg)
                if dcfg.repeat_penalty != 1.0:
                    logits = apply_repetition_penalty(
                        logits, save0, num, dcfg.repeat_penalty,
                        dcfg.penalty_range)
                tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
                fin = (tok0[0] == cfg.codec_eos_token_id)
                save0 = jax.lax.dynamic_update_slice(save0, tok0[:, None],
                                                     (0, num))
                frame_ids, ce0 = self._predictor(params, hid[:, None],
                                                 tok0, cfg)
                frames = frames.at[n_in].set(frame_ids)
                gather = jnp.minimum(num, trailing_minus)
                nxt = next_talker_input(params, frame_ids, ce0, trailing,
                                        gather, cfg)
                pos = kv.length
                rc = jax.lax.dynamic_slice(params["rope_cos"], (pos, 0),
                                           (1, t.head_dim))
                rs = jax.lax.dynamic_slice(params["rope_sin"], (pos, 0),
                                           (1, t.head_dim))
                hid, kv = qwen3_stack_step(params["talker"], nxt, kv, t,
                                           rc, rs, fused=self._fused)
                return kv, hid, frames, save0, n_in + 1, num + 1, fin

            init = (kv, hid, frames, save0, jnp.zeros((), jnp.int32), num,
                    jnp.zeros((), bool))
            kv, hid, frames, save0, n_in, num, fin = jax.lax.while_loop(
                cond, body, init)
            n_keep = n_in - fin.astype(jnp.int32)
            return kv, hid, frames, save0, n_keep, num, fin

        return jax.jit(run)

    def synthesize_streaming(self, prefill: np.ndarray, trailing: np.ndarray,
                             chunk_frames: int = 24, window: int = 72,
                             left_context: int = 24):
        """Generator of int16 audio chunks. Runs the talker/predictor loop
        in `chunk_frames` slices and streams the 12 Hz codec decode with
        left-context overlap discard (reference streaming mode,
        Export_Qwen_TTS_ONNX.py:2706-2726)."""
        from .streaming import ChunkedCodecStream

        cfg, dcfg = self.cfg, self.dcfg
        p_len = prefill.shape[1]
        buf = np.zeros((1, MAX_PREFILL, cfg.talker.hidden_size), np.float32)
        buf[:, :p_len] = prefill
        tb = max(64, -(-trailing.shape[1] // 64) * 64)
        tr = np.zeros((1, tb, cfg.talker.hidden_size), np.float32)
        tr[:, :trailing.shape[1]] = trailing
        tr[:, trailing.shape[1]:] = trailing[:, -1:]

        if not hasattr(self, "_prefill_fn") or self._prefill_fn is None:
            self._prefill_fn = self._build_prefill()
        key = ("chunk", chunk_frames, tb)
        if key not in self._codec_cache:
            self._codec_cache[key] = self._build_chunk(chunk_frames)
        chunk_fn = self._codec_cache[key]

        codec = ChunkedCodecStream(
            lambda codes: self._codec_fn(window)(
                self.codec_params, jnp.asarray(codes.astype(np.int32))),
            window=window, left_context=left_context,
            upsample=self.codec_cfg.total_upsample,
            num_groups=cfg.num_code_groups)

        # np scalars/arrays ride the fast jit-argument path; per-call
        # jnp.int32()/jnp.zeros() each cost a ~30 ms blocking round-trip on a
        # remote-device tunnel
        kv, hid = self._prefill_fn(self.params, jnp.asarray(buf),
                                   np.int32(p_len))
        save0 = np.zeros((1, dcfg.max_frames), np.int32)
        num = np.int32(0)
        budget = np.int32(dcfg.max_frames)
        trailing_dev = jnp.asarray(tr)
        while True:
            kv, hid, frames, save0, n_keep, num, fin = chunk_fn(
                self.params, kv, hid, save0, trailing_dev, num, budget)
            n = int(n_keep)
            if n > 0:
                out = codec.push_frames(np.asarray(frames)[:n])
                if out is not None and len(out):
                    yield out
            if bool(fin) or int(num) >= dcfg.max_frames or n == 0:
                break
        for out in codec.finish():
            if len(out):
                yield out

    # -------------------------------------------------------------- public

    def synthesize_from_prefill(self, prefill: np.ndarray,
                                trailing: np.ndarray
                                ) -> tuple[np.ndarray, dict]:
        cfg = self.cfg
        p_len = prefill.shape[1]
        buf = np.zeros((1, MAX_PREFILL, cfg.talker.hidden_size), np.float32)
        buf[:, :p_len] = prefill

        # trailing is bucketed so the decode fn compiles once per bucket
        tb = max(64, -(-trailing.shape[1] // 64) * 64)
        tr = np.zeros((1, tb, cfg.talker.hidden_size), np.float32)
        tr[:, :trailing.shape[1]] = trailing
        # repeat last (pad) embedding through the bucket so gather beyond
        # the true length returns the pad embedding
        tr[:, trailing.shape[1]:] = trailing[:, -1:]

        if self._decode_fn is None:
            self._decode_fn = {}
        if tb not in self._decode_fn:
            self._decode_fn[tb] = self._build_decode(tb)

        t0 = time.perf_counter()
        frames, num = self._decode_fn[tb](
            self.params, jnp.asarray(buf), np.int32(p_len), jnp.asarray(tr))
        num = int(num)                      # scalar fence picks the bucket
        if num == 0:
            return np.zeros(0, np.int16), {"frames": 0, "wall_s": 0.0}
        fb = min(max(8, -(-num // 8) * 8), self.dcfg.max_frames)
        # frames stays on device; the codec slices/masks it in-graph
        wav = self._codec_dev_fn(fb)(self.codec_params, frames, np.int32(num))
        wav = np.asarray(wav)[0, : num * self.codec_cfg.total_upsample]
        wall = time.perf_counter() - t0
        return wav, {"frames": num, "wall_s": wall,
                     "frames_per_s": num / max(wall, 1e-9)}

    def synthesize_from_prefill_batch(
            self, requests: list[tuple[np.ndarray, np.ndarray]]
            ) -> tuple[list[np.ndarray], dict]:
        """Batched serving: B (prefill, trailing) requests decode
        concurrently (right-justified prefills + per-row masks), then the
        codec decodes all live streams at the max frame bucket. Returns
        (list of int16 waveforms, aggregate stats)."""
        cfg = self.cfg
        bsz = len(requests)
        pmax = max(64, -(-max(p.shape[1] for p, _ in requests) // 64) * 64)
        tmax = max(tr.shape[1] for _, tr in requests)
        tb = max(64, -(-tmax // 64) * 64)
        buf = np.zeros((bsz, pmax, cfg.talker.hidden_size), np.float32)
        pad_start = np.zeros((bsz,), np.int32)
        tr_buf = np.zeros((bsz, tb, cfg.talker.hidden_size), np.float32)
        for b, (p, tr) in enumerate(requests):
            buf[b, pmax - p.shape[1]:] = p[0]
            pad_start[b] = pmax - p.shape[1]
            tr_buf[b, : tr.shape[1]] = tr[0]
            tr_buf[b, tr.shape[1]:] = tr[0, -1:]

        key = ("batch", bsz, pmax, tb)
        if not hasattr(self, "_batch_fns"):
            self._batch_fns = {}
        if key not in self._batch_fns:
            self._batch_fns[key] = self._build_decode_batch(bsz)

        if self.mesh is not None:
            from ..parallel.mesh import dp_shard

            if bsz % self.mesh.shape["dp"]:
                raise ValueError(f"batch {bsz} not divisible by "
                                 f"dp={self.mesh.shape['dp']}")
            buf_dev = dp_shard(self.mesh, buf)
            pad_dev = dp_shard(self.mesh, pad_start)
            tr_dev = dp_shard(self.mesh, tr_buf)
        else:
            buf_dev, pad_dev, tr_dev = (jnp.asarray(buf),
                                        np.asarray(pad_start),
                                        jnp.asarray(tr_buf))

        t0 = time.perf_counter()
        frames, done = self._batch_fns[key](
            self.params, buf_dev, pad_dev, tr_dev)
        done = np.asarray(done)             # (B,) fence picks the bucket
        nfr = [int(done[b]) for b in range(bsz)]
        wavs: list[np.ndarray | None] = [None] * bsz
        live = [b for b in range(bsz) if nfr[b] > 0]
        if live:
            fb = min(max(8, -(-max(nfr[b] for b in live) // 8) * 8),
                     self.dcfg.max_frames)
            wav = np.asarray(self._codec_dev_fn(fb, len(live))(
                self.codec_params, frames, np.asarray(live, np.int32),
                np.asarray(nfr, np.int32)[np.asarray(live)]))
            up = self.codec_cfg.total_upsample
            for i, b in enumerate(live):
                wavs[b] = wav[i, : nfr[b] * up]
        for b in range(bsz):
            if wavs[b] is None:
                wavs[b] = np.zeros(0, np.int16)
        wall = time.perf_counter() - t0
        total = sum(nfr)
        return wavs, {"frames": total, "wall_s": wall,
                      "frames_per_s": total / max(wall, 1e-9)}

    def synthesize_ids(self, text_ids: np.ndarray, language_id: int = 0,
                       speaker_id: int | None = None,
                       instruct_ids: np.ndarray | None = None
                       ) -> tuple[np.ndarray, dict]:
        prefill, trailing = self.build_prefill_embeds(
            text_ids, language_id, speaker_id, instruct_ids=instruct_ids)
        return self.synthesize_from_prefill(prefill, trailing)
