"""Per-stage session parity drivers for the four AR families.

Wav-mode parity (run_reference.run_wav_family) only says pass/fail; these
drivers compare OUR jitted stage functions against the reference's
exported ONNX graphs at matched inputs, so a mel-L1 failure localizes to
a stage immediately. Graph I/O contracts mirrored here:

- Kani:    Embed / Main / Codec graphs
  (/root/reference/Kani_TTS/Export_Kani_TTS.py:588,614-645,474-564):
  Main feed order = [*keys, *values, *convs, hidden_states, history_len,
  ids_len], outputs [*keys, *values, *convs, logits, kv_seq_len].
- IndexTTS: B (text embed), C (step embed), E (AR step), F (vocoder)
  (/root/reference/IndexTTS/Export_IndexTTS.py:368,389,435-459,292-314):
  E feed = [*keys, *values, history_len, repeat_penality, ids_len,
  hidden_states, attention_mask_flag].
- Qwen:    TTS_MAIN talker step, TTS_PREDICTOR 15-group frame loop
  (per-group LmHead_g / Embed_D_g sessions), TTS_DECODER codec decode
  (/root/reference/Qwen_TTS/Export_Qwen_TTS_ONNX.py:1696-1795):
  stack feed = [*keys, *values, hidden_states, rotary_cos, rotary_sin,
  attention_mask], outputs [*keys, *values, last_hidden(, logits)].
- VoxCPM:  Feat_Encoder_Cond, Main (dual-LM step), Feat_Decoder with
  MATCHED noise, VAE_Decoder
  (/root/reference/VoxCPM/v1.5/Export_VoxCPM_ONNX.py:813,882-897,920,938).

Each driver takes a dict of session objects (anything with
`.get_inputs()` -> [obj with .name/.shape] and `.run(None, feed)`), our
params/configs, and returns a list of StageDiff. KV-cache inputs are
zero-initialized from the session's declared shapes (dynamic time axes
resolve to the empty cache), then rebound positionally output->input
across steps exactly like the reference runtimes
(Inference_Kani_TTS_ONNX.py:344-351).

No ONNX artifacts exist in the build environment — tests/test_parity_
sessions.py exercises every driver against mocked sessions built from
our own stage functions (diff must be ~0) and against a corrupted mock
(the diff must land on the corrupted stage only).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = ["StageDiff", "kani_session_stages", "indextts_session_stages",
           "qwen_session_stages", "voxcpm_session_stages"]


@dataclass
class StageDiff:
    stage: str
    max_abs: float
    detail: str = ""

    @property
    def ok(self) -> bool:
        return self.max_abs <= 1e-2

    def line(self) -> str:
        flag = "PASS" if self.ok else "FAIL"
        return f"  {self.stage:24s} {flag} max|Δ|={self.max_abs:.3e} {self.detail}"


def _resolve_shape(shape, dyn: int = 0) -> tuple[int, ...]:
    """ONNX declared shape -> concrete: dynamic dims (str/None) become
    `dyn` (0 = empty cache axis)."""
    return tuple(d if isinstance(d, int) else dyn for d in shape)


def _feed(sess, pool: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Build a feed: named tensors from the pool; any input not in the
    pool (KV caches on the first call) zero-fills from its declared
    shape."""
    feed = {}
    for inp in sess.get_inputs():
        if inp.name in pool:
            feed[inp.name] = pool[inp.name]
        else:
            feed[inp.name] = np.zeros(_resolve_shape(inp.shape), np.float32)
    return feed


def _run_list(sess, tensors: list[np.ndarray]) -> list[np.ndarray]:
    """Feed positionally by the session's declared input order (the
    reference runtimes thread tensors positionally)."""
    names = [i.name for i in sess.get_inputs()]
    return sess.run(None, dict(zip(names, tensors)))


def _diff(name: str, ours, theirs, detail: str = "") -> StageDiff:
    ours = np.asarray(ours, np.float32).reshape(-1)
    theirs = np.asarray(theirs, np.float32).reshape(-1)
    if ours.shape != theirs.shape:
        return StageDiff(name, float("inf"),
                         f"shape {ours.shape} vs {theirs.shape} {detail}")
    return StageDiff(name, float(np.max(np.abs(ours - theirs), initial=0.0)),
                     detail)


def _zero_kv_inputs(sess, pool: dict) -> list[np.ndarray]:
    """Zero tensors for every input NOT supplied in the pool, in declared
    order — the empty-cache prefix of a stack-step feed."""
    out = []
    for inp in sess.get_inputs():
        if inp.name not in pool:
            out.append(np.zeros(_resolve_shape(inp.shape), np.float32))
    return out


def _additive_causal_mask(s: int, kv_len: int) -> np.ndarray:
    """float additive mask (1, 1, S, kv_len): 0 where visible, -inf-ish
    where masked (the reference's int8 -128 triangle cast to float,
    Export_Qwen_TTS_ONNX.py:293)."""
    q = np.arange(s)[:, None] + (kv_len - s)
    k = np.arange(kv_len)[None, :]
    m = np.where(k <= q, 0.0, -65504.0).astype(np.float32)
    return m[None, None]


# ------------------------------------------------------------------- Kani

def kani_session_stages(sessions: dict, params, cfg, cparams=None,
                        ccfg=None, seed: int = 0,
                        audio_tokens_start: int | None = None
                        ) -> list[StageDiff]:
    """Stages: embed, main_step (fresh cache), codec."""
    import jax.numpy as jnp

    from ..models.kani import embed_tokens, init_state, kani_step
    rng = np.random.default_rng(seed)
    diffs = []

    ids = rng.integers(0, cfg.vocab_size, (1, 8)).astype(np.int64)
    ours_embed = np.asarray(embed_tokens(params, jnp.asarray(ids)))
    if "embed" in sessions:
        theirs = _run_list(sessions["embed"], [ids])[0]
        diffs.append(_diff("kani/embed", ours_embed, theirs))

    if "main" in sessions:
        sess = sessions["main"]
        pool = {"hidden_states": ours_embed.astype(np.float32),
                "history_len": np.zeros(1, np.int64),
                "ids_len": np.array([ids.shape[1]], np.int64)}
        out = sess.run(None, _feed(sess, pool))
        # outputs = [*keys, *values, *convs, logits, kv_seq_len]
        theirs_logits = out[-2]
        logits, _ = kani_step(params, jnp.asarray(ours_embed),
                              init_state(cfg), cfg)
        diffs.append(_diff("kani/main_step", np.asarray(logits),
                           theirs_logits))

    if "codec" in sessions and cparams is not None:
        from ..models.nanocodec import (fsq_dequantize, hifigan_decode,
                                        tokens_to_codes)

        start = (audio_tokens_start if audio_tokens_start is not None
                 else cfg.vocab_size - ccfg.num_groups * ccfg.codebook_size)
        frames = 6
        toks = (rng.integers(0, ccfg.codebook_size,
                             (1, frames * ccfg.num_groups))
                + np.tile(np.arange(ccfg.num_groups) * ccfg.codebook_size,
                          frames) + start).astype(np.int64)
        theirs = _run_list(sessions["codec"],
                           [toks, np.array([toks.shape[1]], np.int64)])[0]
        codes = tokens_to_codes(jnp.asarray(toks), ccfg, start)
        wav = hifigan_decode(cparams, fsq_dequantize(codes, ccfg), ccfg)
        ours = (np.clip(np.asarray(wav), -1, 1) * 32767).astype(np.int16)
        diffs.append(_diff("kani/codec", ours.astype(np.float32) / 32768,
                           np.asarray(theirs, np.float32).reshape(-1)
                           / 32768))
    return diffs


# --------------------------------------------------------------- IndexTTS

def indextts_session_stages(sessions: dict, params, cfg, seed: int = 0
                            ) -> list[StageDiff]:
    """Stages: text_embed (B), step_embed (C), gpt_step (E)."""
    import jax.numpy as jnp

    from ..kv.cache import KVCache
    from ..models.indextts import gpt_embed_mel, gpt_embed_text, gpt_step
    rng = np.random.default_rng(seed)
    diffs = []

    text_ids = rng.integers(0, cfg.num_text_tokens, (1, 6)).astype(np.int64)
    if "b" in sessions:
        theirs = _run_list(sessions["b"], [text_ids])[0]
        ours = gpt_embed_text(params, jnp.asarray(text_ids))
        diffs.append(_diff("indextts/text_embed", np.asarray(ours), theirs))

    mel_id = np.array([[int(rng.integers(0, cfg.num_mel_codes))]], np.int64)
    if "c" in sessions:
        theirs = _run_list(
            sessions["c"], [mel_id, np.zeros(1, np.int64)])[0]
        ours = gpt_embed_mel(params, jnp.asarray(mel_id), 0)
        diffs.append(_diff("indextts/step_embed", np.asarray(ours), theirs))

    if "e" in sessions:
        hidden = rng.standard_normal(
            (1, 4, cfg.gpt_dim)).astype(np.float32)
        penalty = np.ones((1, cfg.num_mel_codes), np.float32)
        sess = sessions["e"]
        pool = {"hidden_states": hidden,
                "history_len": np.zeros(1, np.int64),
                "repeat_penality": penalty,        # reference's spelling
                "ids_len": np.array([hidden.shape[1]], np.int64),
                "attention_mask_flag": np.ones(1, np.float32)}
        out = sess.run(None, _feed(sess, pool))
        # outputs = [*keys, *values, kv_seq_len, last_hidden, max_id]
        theirs_hidden, theirs_id = out[-2], out[-1]
        kv = KVCache.create(cfg.gpt_layers, 1, cfg.gpt_heads,
                            cfg.max_seq_len, cfg.gpt_head_dim, jnp.float32)
        logits, last, _ = gpt_step(params, jnp.asarray(hidden), kv,
                                   jnp.asarray(penalty), cfg)
        diffs.append(_diff("indextts/gpt_step_hidden", np.asarray(last),
                           theirs_hidden))
        diffs.append(_diff("indextts/gpt_step_argmax",
                           np.argmax(np.asarray(logits), -1).astype(np.float32),
                           np.asarray(theirs_id, np.float32).reshape(-1)))
    return diffs


# ------------------------------------------------------------------- Qwen

def qwen_session_stages(sessions: dict, params, cfg, cparams=None,
                        ccfg=None, seed: int = 0) -> list[StageDiff]:
    """Stages: talker_step (TTS_MAIN), predictor_frame (TTS_PREDICTOR +
    LmHead_g + Embed_D_g loop, greedy), codec_decode (TTS_DECODER)."""
    import jax.numpy as jnp

    from ..kv.cache import KVCache
    from ..models.qwen_tts import (predictor_frame, qwen3_stack_step,
                                   talker_logits)
    rng = np.random.default_rng(seed)
    diffs = []
    tcfg = cfg.talker

    hidden = rng.standard_normal((1, 3, tcfg.hidden_size)).astype(np.float32)
    rope_cos = np.asarray(params["rope_cos"])[:3][None]
    rope_sin = np.asarray(params["rope_sin"])[:3][None]
    if "main" in sessions:
        sess = sessions["main"]
        pool = {"hidden_states": hidden,
                "rotary_cos": rope_cos.astype(np.float32),
                "rotary_sin": rope_sin.astype(np.float32),
                "attention_mask": _additive_causal_mask(3, 3)}
        out = sess.run(None, _feed(sess, pool))
        # outputs = [*keys, *values, last_hidden, logits]
        theirs_hidden, theirs_logits = out[-2], out[-1]
        kv = KVCache.create(tcfg.num_layers, 1, tcfg.num_kv_heads,
                            tcfg.max_seq_len, tcfg.head_dim, jnp.float32)
        h, _ = qwen3_stack_step(params["talker"], jnp.asarray(hidden), kv,
                                tcfg,
                                jnp.asarray(params["rope_cos"])[:3],
                                jnp.asarray(params["rope_sin"])[:3])
        logits = talker_logits(params, h, cfg)
        diffs.append(_diff("qwen/talker_hidden", np.asarray(h),
                           theirs_hidden))
        diffs.append(_diff("qwen/talker_logits", np.asarray(logits),
                           theirs_logits))

    if "predictor" in sessions:
        pcfg = cfg.predictor
        talker_h = rng.standard_normal(
            (1, 1, tcfg.hidden_size)).astype(np.float32)
        tok0 = int(rng.integers(0, cfg.codec_vocab))
        # reference inner loop (Export_Qwen_TTS_ONNX.py:2485-2597):
        # prefill [talker_hidden ++ embed_b(tok0)], then 15 greedy steps
        emb0 = np.asarray(params["talker_codec_embed"])[tok0][None, None]
        prefill = np.concatenate([talker_h, emb0], axis=1)
        pcos = np.asarray(params["pred_rope_cos"])
        psin = np.asarray(params["pred_rope_sin"])
        sess = sessions["predictor"]
        kv_n = sum(1 for i in sess.get_inputs()
                   if i.name not in ("hidden_states", "rotary_cos",
                                     "rotary_sin", "attention_mask"))
        kvs = _zero_kv_inputs(sess, {"hidden_states": 0, "rotary_cos": 0,
                                     "rotary_sin": 0, "attention_mask": 0})
        frame = [tok0]
        h_cur, kv_len = prefill, 0
        for g in range(cfg.num_code_groups - 1):
            s = h_cur.shape[1]
            feed = kvs + [h_cur.astype(np.float32),
                          pcos[kv_len:kv_len + s][None].astype(np.float32),
                          psin[kv_len:kv_len + s][None].astype(np.float32),
                          _additive_causal_mask(s, kv_len + s)]
            out = _run_list(sess, feed)
            kvs = list(out[:kv_n])
            last_hidden = out[kv_n]
            kv_len += s
            logits = _run_list(sessions[f"lm_head_{g}"], [last_hidden])[0]
            tok = int(np.argmax(logits.reshape(-1)))
            frame.append(tok)
            if g < cfg.num_code_groups - 2:
                h_cur = _run_list(sessions[f"embed_d_{g}"],
                                  [np.array([[tok]], np.int64)])[0]
        ours_frame, _ = predictor_frame(params, jnp.asarray(talker_h),
                                        jnp.asarray([tok0], jnp.int32), cfg)
        diffs.append(_diff("qwen/predictor_frame",
                           np.asarray(ours_frame, np.float32),
                           np.asarray(frame, np.float32)))

    if "decoder" in sessions and cparams is not None:
        from ..models.qwen_codec import codec_decode

        frames = 4
        codes = rng.integers(0, ccfg.codebook_size,
                             (1, frames, ccfg.num_quantizers)).astype(np.int32)
        theirs = _run_list(
            sessions["decoder"],
            [codes.reshape(1, -1).astype(np.int64)])[0]
        wav = codec_decode(cparams, jnp.asarray(codes), ccfg)
        ours = (np.clip(np.asarray(wav), -1, 1) * 32767).astype(np.int16)
        diffs.append(_diff("qwen/codec_decode",
                           ours.astype(np.float32) / 32768,
                           np.asarray(theirs, np.float32).reshape(-1)
                           / 32768))
    return diffs


# ----------------------------------------------------------------- VoxCPM

def voxcpm_session_stages(sessions: dict, params, cfg, vae_params=None,
                          seed: int = 0) -> list[StageDiff]:
    """Stages: feat_encoder_cond, main_step (dual-LM), feat_decoder with
    MATCHED noise, vae_decode."""
    import jax.numpy as jnp

    from ..kv.cache import KVCache
    from ..models.voxcpm import (cfm_feat_decoder, feat_encoder_cond,
                                 vae_decode, voxcpm_main_step)
    rng = np.random.default_rng(seed)
    diffs = []

    t_patch = 3
    audio_feat = rng.standard_normal(
        (t_patch, cfg.patch_size, cfg.vae.latent_dim)).astype(np.float32)
    feat_embed, feat_cond = feat_encoder_cond(
        params, jnp.asarray(audio_feat), cfg)
    if "feat_encoder" in sessions:
        out = _run_list(sessions["feat_encoder"], [audio_feat])
        diffs.append(_diff("voxcpm/feat_embed", np.asarray(feat_embed),
                           out[0]))
        diffs.append(_diff("voxcpm/feat_cond", np.asarray(feat_cond),
                           out[1]))

    s = 4
    hidden = rng.standard_normal(
        (1, s, cfg.base.hidden_size)).astype(np.float32)
    fe = rng.standard_normal(
        (1, s, cfg.base.hidden_size)).astype(np.float32)
    text_len = 2
    dit_hidden = None
    if "main" in sessions:
        sess = sessions["main"]
        pool = {"feat_embed": fe,
                "concat_text_len": np.array([text_len], np.int64),
                "hidden_states": hidden,
                "rotary_cos": np.asarray(params["rope_cos"])[:s][None],
                "rotary_sin": np.asarray(params["rope_sin"])[:s][None],
                "attention_mask": _additive_causal_mask(s, s)}
        out = sess.run(None, _feed(sess, pool))
        # outputs = [*kvs, dit_hidden, stop_flag, random]
        theirs_dit = out[-3]
        base_kv = KVCache.create(cfg.base.num_layers, 1,
                                 cfg.base.num_kv_heads, cfg.base.max_seq_len,
                                 cfg.base.head_dim, jnp.float32)
        res_kv = KVCache.create(cfg.residual.num_layers, 1,
                                cfg.residual.num_kv_heads,
                                cfg.residual.max_seq_len,
                                cfg.residual.head_dim, jnp.float32)
        dit_hidden, stop, _, _ = voxcpm_main_step(
            params, jnp.asarray(hidden), jnp.asarray(fe), text_len,
            base_kv, res_kv, cfg)
        diffs.append(_diff("voxcpm/main_dit_hidden", np.asarray(dit_hidden),
                           theirs_dit))

    if "feat_decoder" in sessions:
        noise = rng.standard_normal(
            (1, cfg.patch_size, cfg.vae.latent_dim)).astype(np.float32)
        dh = (np.asarray(dit_hidden) if dit_hidden is not None else
              rng.standard_normal(
                  (1, 1, cfg.estimator.hidden_size)).astype(np.float32))
        cfg_val = cfg.cfg_value
        theirs = _run_list(
            sessions["feat_decoder"],
            [noise, dh.astype(np.float32), np.asarray(feat_cond),
             np.array([cfg_val], np.float32),
             np.array([1.0 - cfg_val], np.float32)])[0]
        ours = cfm_feat_decoder(params, jnp.asarray(noise),
                                jnp.asarray(dh), feat_cond, cfg)
        diffs.append(_diff("voxcpm/feat_decoder", np.asarray(ours), theirs))

    if "vae_decoder" in sessions and vae_params is not None:
        latents = rng.standard_normal(
            (1, 2 * cfg.patch_size, cfg.vae.latent_dim)).astype(np.float32)
        theirs = _run_list(sessions["vae_decoder"], [latents])[0]
        wav = vae_decode(vae_params, jnp.asarray(latents), cfg.vae)
        ours = (np.clip(np.asarray(wav), -1, 1) * 32767).astype(np.int16)
        diffs.append(_diff("voxcpm/vae_decode",
                           ours.astype(np.float32) / 32768,
                           np.asarray(theirs, np.float32).reshape(-1)
                           / 32768))
    return diffs
