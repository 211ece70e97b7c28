"""VoxCPM-1.5 synthesis pipeline: prompt audio + text -> cloned speech.

Reference behavior: /root/reference/VoxCPM/v1.5/Inference_VoxCPM_ONNX.py
:384-580 — hot loop of exactly 4 session calls per step (Main ->
Feat_Decoder -> Feat_Encoder_Cond -> Rotary_Decode). Here the whole loop —
dual-LM step, 10-step CFM scan, feature re-encoding, stop check — is ONE
lax.while_loop; prefill feeds the [prompt_text | target_text | audio_start
| prompt feats] sequence serially through the same step so a single
compiled program serves every prompt/text length.

VAE encode/decode are separate jitted programs (bucketed), matching the
reference's non-streaming path (:562-580).
"""
from __future__ import annotations

import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from ..models.voxcpm import (
    VoxCPMConfig,
    cfm_feat_decoder,
    cfm_feat_decoder_batch,
    feat_encoder_cond,
    feat_encoder_cond_batch,
    vae_decode,
    vae_encode,
    voxcpm_main_step,
)

__all__ = ["VoxCPMPipeline", "VoxCPMDecodeConfig"]

MAX_PREFILL_TOKENS = 256   # text tokens incl. audio_start
MAX_PROMPT_FEATS = 256     # prompt audio patches


@dataclass(frozen=True)
class VoxCPMDecodeConfig:
    max_latents: int = 256
    decode_limit_factor: int = 8       # limit = text_len * factor + 10
    min_latents: int = 2               # MIN_SEQ_LEN before stop checks
    seed: int = 9527
    # retry with a fresh seed when generation hits the length cap without a
    # stop token (upstream bad-case retry, modeling_modified/core.py:140-142)
    retry_badcase: int = 0
    # Pallas fused decode qkv head (ops/decode_qkv.py); None = auto
    # (on for TPU backends, off on CPU)
    # None = auto: "step" (qkv+attention single kernel,
    # ops/decode_step.py — main-LM step below the qkv-head kernel on both A/B pairs) on TPU, off on CPU;
    # True = qkv-head kernel only; per-call degradation
    # outside the M=1 plain-causal geometry is automatic.
    fused_decode: bool | str | None = None


class VoxCPMPipeline:
    def __init__(self, params, cfg: VoxCPMConfig, vae_params,
                 decode_cfg: VoxCPMDecodeConfig | None = None,
                 output_sample_rate: int | None = None,
                 quantize: int | None = None, mesh=None):
        if quantize:
            # base/residual/feat-encoder/estimator LM matmuls; the VAE is
            # passed separately and stays float
            from ..quant.weight_only import quantize_pytree

            params = quantize_pytree(params, bits=quantize)
        if mesh is not None:
            # data-parallel serving: params replicated, synthesize_ids_batch
            # shards its request batch over the mesh "dp" axis
            from ..parallel.mesh import replicate

            params = replicate(params, mesh)
            vae_params = replicate(vae_params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.vae_params = vae_params
        self.dcfg = decode_cfg or VoxCPMDecodeConfig()
        fd = self.dcfg.fused_decode
        self._fused = ("step" if jax.default_backend() == "tpu"
                       else False) if fd is None else fd
        self.output_sample_rate = output_sample_rate or cfg.output_sample_rate
        self._enc_cache: dict = {}
        self._dec_cache = {}
        self._vae_dec_cache: dict = {}
        self._key_cache: dict = {}

    def _get_key(self, seed: int):
        key = self._key_cache.get(seed)
        if key is None:
            key = self._key_cache[seed] = jax.random.key(seed)
        return key

    # ------------------------------------------------------------- prompt

    def _encode_fn(self, n: int):
        if n not in self._enc_cache:
            cfg = self.cfg

            @jax.jit
            def run(vae_params, params, audio):
                lat = vae_encode(vae_params, audio, cfg.vae)   # (1, T', lat)
                t = lat.shape[1] // cfg.patch_size
                feats = lat[0, : t * cfg.patch_size].reshape(
                    t, cfg.patch_size, -1)
                feat_embed, feat_cond = feat_encoder_cond(params, feats, cfg)
                return feats, feat_embed, feat_cond

            self._enc_cache[n] = run
        return self._enc_cache[n]

    def encode_prompt(self, audio: np.ndarray):
        """audio: int16 or float mono at cfg.sample_rate (44.1 kHz).
        Returns (audio_feat patches, feat_embed, feat_cond) on device."""
        cfg = self.cfg
        if audio.dtype == np.int16:
            audio = audio.astype(np.float32) / 32768.0
        patch_len = cfg.patch_size * cfg.chunk_size
        # left-pad to a patch multiple + one trailing zero patch (:113-115)
        pad = patch_len - (len(audio) % patch_len)
        audio = np.concatenate([
            np.zeros(pad, np.float32), audio.astype(np.float32),
            np.zeros(patch_len, np.float32)])
        bucket = -(-len(audio) // (patch_len * 8)) * (patch_len * 8)
        audio = np.pad(audio, (0, bucket - len(audio)))[None]
        return self._encode_fn(bucket)(self.vae_params, self.params,
                                       jnp.asarray(audio))

    # ------------------------------------------------------------- decode

    def _build_decode(self, buf: int):
        """Prefill + generation + VAE decode fused into ONE dispatch.

        `buf` (static) bounds the latent buffer — the host buckets
        min(max_steps, max_latents) so short requests don't pay a
        max_latents-sized VAE decode. Returning (wav_int16, num) from a
        single jit collapses the old 3-4 tunnel round trips per call
        (decode dispatch, int(num) fence, latents fetch, VAE dispatch +
        wav fetch) into one dispatch + one fetch — on the axon tunnel each
        round trip costs ~30-70 ms, which dominated short-utterance RTF.
        Numerics are identical: the old separate path also zero-padded
        latents past `num` before the causal-conv VAE."""
        cfg, dcfg = self.cfg, self.dcfg
        b = cfg.base
        sr_idx = int(np.searchsorted(np.asarray(cfg.vae.sr_bins),
                                     cfg.output_sample_rate)) \
            if cfg.vae.sr_bins else 0

        def run(params, vae_params, text_buf, is_audio, prefill_len,
                feat_embed_buf, feat_cond0, max_steps, key):
            """Generic segmented prefill: position i is either a text token
            (text_buf[0, i] embedded) or an audio patch (feat_embed_buf[:, i]).
            This one loop serves v1.5's [text | audio_start | feats] layout
            and all four v2 Assemble modes (v2 Export:1014-1115) — the
            per-position kind mask IS the segment plan."""
            dt = params["embed"].dtype
            feat_embed_buf = feat_embed_buf.astype(dt)
            feat_cond0 = feat_cond0.astype(dt)
            # KV bucketed to the reachable length (prefill bucket + latent
            # cap; each latent step appends one position) — decode attention
            # reads the whole static buffer every step, so dead buffer width
            # is pure HBM waste (see kv/cache.py layout note)
            kv_max = min(b.max_seq_len,
                         -(-(text_buf.shape[1] + buf + 1) // 128) * 128)
            base_kv = KVCache.create(b.num_layers, 1, b.num_kv_heads,
                                     kv_max, b.head_dim, dt)
            res_kv = KVCache.create(cfg.residual.num_layers, 1,
                                    cfg.residual.num_kv_heads, kv_max,
                                    cfg.residual.head_dim, dt)

            # batched prefill: the per-position kind mask IS the segment
            # plan, so one dual-LM pass over the whole padded bucket
            # replaces the old one-position-at-a-time loop (which paid
            # per-position launch overhead); KV lengths rewind to the true
            # prompt length afterwards (padded garbage is overwritten by
            # decode and never exposed by the causal mask)
            h = jnp.where(is_audio[None, :, None], feat_embed_buf,
                          params["embed"][text_buf])
            dit, stop, base_kv, res_kv = voxcpm_main_step(
                params, h, feat_embed_buf, is_audio, base_kv, res_kv, cfg,
                valid_len=prefill_len)
            base_kv = base_kv.rewind(prefill_len)
            res_kv = res_kv.rewind(prefill_len)

            # ---- generation loop
            latents = jnp.zeros((buf, cfg.patch_size, cfg.vae.latent_dim))

            def gcond(c):
                _, _, _, _, _, _, num, fin = c
                return (~fin) & (num < jnp.minimum(max_steps, buf))

            def gbody(c):
                base_kv, res_kv, dit, feat_cond, latents, key, num, _ = c
                key, sub = jax.random.split(key)
                noise = jax.random.normal(
                    sub, (1, cfg.patch_size, cfg.vae.latent_dim))
                latent = cfm_feat_decoder(params, noise, dit, feat_cond, cfg)
                latents = jax.lax.dynamic_update_slice(
                    latents, latent.astype(latents.dtype), (num, 0, 0))
                feat_embed, feat_cond = feat_encoder_cond(
                    params, latent.astype(dt), cfg)
                feat_cond = feat_cond.astype(dt)
                h = feat_embed[:, :1].astype(dt)
                dit, stop, base_kv, res_kv = voxcpm_main_step(
                    params, h, h, jnp.int32(0), base_kv, res_kv, cfg,
                    fused=self._fused)
                # stop token honored only after min_latents (the reference's
                # MIN_SEQ_LEN guard, v2 Export:99)
                fin = (stop == 1) & (num + 1 >= dcfg.min_latents)
                return (base_kv, res_kv, dit, feat_cond, latents, key,
                        num + 1, fin)

            init = (base_kv, res_kv, dit, feat_cond0, latents, key,
                    jnp.zeros((), jnp.int32), jnp.zeros((), bool))
            _, _, _, _, latents, _, num, _ = jax.lax.while_loop(
                gcond, gbody, init)
            flat = latents.reshape(1, -1, cfg.vae.latent_dim)
            wav = vae_decode(vae_params["dec"], flat, cfg.vae, sr_idx=sr_idx)
            return (wav * 32767.0).astype(jnp.int16), num

        return jax.jit(run)

    def _build_decode_batch(self, bsz: int, s_buf: int, buf: int):
        """Batched serving: B segmented prompts right-justified in one
        bucket (per-row kv_valid masks the left pad; rope is relative so
        the shared shift is free), per-row stop/cap tracking, batched CFM +
        feat-encoder + dual-LM steps.

        `buf` (static) bounds the latent buffer to the bucketed max of the
        per-row caps, and the batched VAE decode is fused into the same
        dispatch (rows' latents are zeroed past their stop first, matching
        the old compact zero-padded decode bit-for-bit)."""
        cfg, dcfg = self.cfg, self.dcfg
        b = cfg.base
        sr_idx = int(np.searchsorted(np.asarray(cfg.vae.sr_bins),
                                     cfg.output_sample_rate)) \
            if cfg.vae.sr_bins else 0

        def run(params, vae_params, text_buf, is_audio, pad_start,
                feat_embed_buf, feat_cond0, caps, key):
            dt = params["embed"].dtype
            feat_embed_buf = feat_embed_buf.astype(dt)
            feat_cond0 = feat_cond0.astype(dt)
            kv_max = min(b.max_seq_len,
                         -(-(s_buf + buf + 1) // 128) * 128)
            base_kv = KVCache.create(b.num_layers, bsz, b.num_kv_heads,
                                     kv_max, b.head_dim, dt)
            res_kv = KVCache.create(cfg.residual.num_layers, bsz,
                                    cfg.residual.num_kv_heads, kv_max,
                                    cfg.residual.head_dim, dt)
            valid = jnp.arange(s_buf)[None, :] >= pad_start[:, None]
            kv_valid = (jnp.arange(kv_max)[None, :]
                        >= pad_start[:, None])

            h = jnp.where(is_audio[..., None], feat_embed_buf,
                          params["embed"][text_buf])
            h = h * valid[..., None]
            dit, stop, base_kv, res_kv = voxcpm_main_step(
                params, h, feat_embed_buf, is_audio, base_kv, res_kv, cfg,
                kv_valid=kv_valid)

            latents = jnp.zeros((bsz, buf, cfg.patch_size,
                                 cfg.vae.latent_dim))

            def gcond(c):
                _, _, _, _, _, _, num, fin, _ = c
                return (~fin.all()) & (num < buf)

            def gbody(c):
                base_kv, res_kv, dit, feat_cond, latents, key, num, fin, done = c
                key, sub = jax.random.split(key)
                noise = jax.random.normal(
                    sub, (bsz, cfg.patch_size, cfg.vae.latent_dim))
                latent = cfm_feat_decoder_batch(params, noise, dit,
                                                feat_cond, cfg)
                latents = jax.lax.dynamic_update_slice(
                    latents, latent.astype(latents.dtype)[:, None],
                    (0, num, 0, 0))
                feat_embed, feat_cond = feat_encoder_cond_batch(
                    params, latent.astype(dt), cfg)
                feat_cond = feat_cond.astype(dt)
                h2 = feat_embed.astype(dt)
                dit, stop, base_kv, res_kv = voxcpm_main_step(
                    params, h2, h2, jnp.int32(0), base_kv, res_kv, cfg,
                    kv_valid=kv_valid, fused=self._fused)
                newly = (((stop == 1) & (num + 1 >= dcfg.min_latents))
                         | (num + 1 >= caps)) & (~fin)
                done = jnp.where(newly, num + 1, done)
                return (base_kv, res_kv, dit, feat_cond, latents, key,
                        num + 1, fin | newly, done)

            done0 = jnp.full((bsz,), buf, jnp.int32)
            init = (base_kv, res_kv, dit, feat_cond0, latents, key,
                    jnp.zeros((), jnp.int32), jnp.zeros((bsz,), bool), done0)
            _, _, _, _, latents, _, num, _, done = jax.lax.while_loop(
                gcond, gbody, init)
            done = jnp.minimum(done, num)
            # finished rows keep generating until the whole batch stops;
            # zero their tail so the causal VAE sees the same zero-padded
            # buffer the old compact per-row decode did
            live_mask = (jnp.arange(buf)[None, :]
                         < done[:, None])[..., None, None]
            flat = (latents * live_mask).reshape(bsz, -1, cfg.vae.latent_dim)
            wav = vae_decode(vae_params["dec"], flat, cfg.vae, sr_idx=sr_idx)
            return (wav * 32767.0).astype(jnp.int16), done

        return jax.jit(run)

    def synthesize_ids_batch(
            self, requests: list[tuple[np.ndarray, np.ndarray]],
            prompt_audios: list[np.ndarray | None] | None = None,
            seed: int | None = None) -> tuple[list[np.ndarray], dict]:
        """Batched serving: B (prompt_ids, target_ids) requests generate
        concurrently through the dual-LM + CFM loop, then one batched VAE
        decode. prompt_audios optionally carries per-request voice-cloning
        audio (the v1.5 [text | audio_start | prompt feats] layout).
        Returns (list of int16 waveforms, aggregate stats)."""
        cfg, dcfg = self.cfg, self.dcfg
        bsz = len(requests)
        if prompt_audios is None:
            prompt_audios = [None] * bsz
        feats = []                    # per-row (feat_embed np, feat_cond np)
        for pa in prompt_audios:
            if pa is None or len(pa) == 0:
                feats.append((None, None))
            else:
                _, fe, fc = self.encode_prompt(pa)
                feats.append((np.asarray(fe, np.float32),
                              np.asarray(fc, np.float32)))
        plans = []
        for (prompt_ids, target_ids), (fe, fc) in zip(requests, feats):
            segments: list = [("text", np.concatenate(
                [prompt_ids[0], target_ids[0],
                 [cfg.audio_start_id]]).astype(np.int32))]
            if fe is not None:
                segments.append(("audio", fe))
            cap = min(target_ids.shape[1] * dcfg.decode_limit_factor + 10,
                      dcfg.max_latents)
            plans.append((segments, fc, cap))
        wavs, stats, counts, caps = self._run_segments_batch(plans, seed)
        # rows that hit their cap without a stop token re-run through the
        # single path, which owns the retry-on-badcase policy (reference
        # core.py:140-142 behavior)
        if self.dcfg.retry_badcase > 0:
            for bi in range(bsz):
                if counts[bi] >= caps[bi]:
                    wavs[bi], _ = self.synthesize_ids(
                        requests[bi][0], requests[bi][1],
                        prompt_audio=prompt_audios[bi], seed=seed)
        return wavs, stats

    def synthesize_v2_batch(self, requests: list[dict],
                            seed: int | None = None
                            ) -> tuple[list[np.ndarray], dict]:
        """Batched VoxCPM-2: each request is a dict with the synthesize_v2
        keyword set (mode, target_ids, ref_audio, prompt_audio, prompt_ids,
        ref_start_id, ref_end_id); rows may mix modes. Same per-row segment
        plans as the single path, decoded concurrently."""
        cfg, dcfg = self.cfg, self.dcfg
        plans = []
        for req in requests:
            mode = req["mode"]
            target = req["target_ids"][0].astype(np.int32)
            rs = np.array([req.get("ref_start_id", 103)], np.int32)
            re_ = np.array([req.get("ref_end_id", 104)], np.int32)
            fc = None
            if mode == "voice_design":
                segments = [("text", target)]
            elif mode == "reference_only":
                _, ref_fe, _ = self.encode_prompt(req["ref_audio"])
                segments = [("text", rs), ("audio", np.asarray(ref_fe)),
                            ("text", re_), ("text", target)]
            elif mode == "continuation":
                _, p_fe, p_fc = self.encode_prompt(req["prompt_audio"])
                fc = np.asarray(p_fc, np.float32)
                segments = [("text", np.concatenate(
                    [req["prompt_ids"][0].astype(np.int32), target])),
                    ("audio", np.asarray(p_fe))]
            elif mode == "combined":
                _, ref_fe, _ = self.encode_prompt(req["ref_audio"])
                _, p_fe, p_fc = self.encode_prompt(req["prompt_audio"])
                fc = np.asarray(p_fc, np.float32)
                segments = [("text", rs), ("audio", np.asarray(ref_fe)),
                            ("text", re_),
                            ("text", np.concatenate(
                                [req["prompt_ids"][0].astype(np.int32),
                                 target])),
                            ("audio", np.asarray(p_fe))]
            else:
                raise ValueError(f"unknown mode {mode!r}")
            cap = min(len(target) * dcfg.decode_limit_factor + 10,
                      dcfg.max_latents)
            plans.append((segments, fc, cap))
        wavs, stats, counts, caps = self._run_segments_batch(plans, seed)
        if self.dcfg.retry_badcase > 0:
            for bi in range(len(requests)):
                if counts[bi] >= caps[bi]:
                    wavs[bi], _ = self.synthesize_v2(seed=seed,
                                                     **requests[bi])
        return wavs, stats

    def _run_segments_batch(self, plans, seed):
        """plans: per row (segments, feat_cond (2, P, H) np | None, cap).
        Rows right-justify into one bucket; the per-position kind mask and
        per-row kv_valid reproduce each row's single-stream layout. Returns
        (wavs, stats, counts, caps)."""
        cfg, dcfg = self.cfg, self.dcfg
        bsz = len(plans)
        flat_rows = []
        for segments, fc, cap in plans:
            total = sum(len(d) if kind == "text" else d.shape[1]
                        for kind, d in segments)
            flat_rows.append(total)
        s_buf = max(16, -(-max(flat_rows) // 16) * 16)
        text_buf = np.zeros((bsz, s_buf), np.int32)
        pad_start = np.zeros((bsz,), np.int32)
        caps = np.zeros((bsz,), np.int32)
        is_audio = np.zeros((bsz, s_buf), bool)
        fe_buf = np.zeros((bsz, s_buf, cfg.base.hidden_size), np.float32)
        feat_cond0 = np.zeros((2 * bsz, cfg.patch_size,
                               cfg.estimator.hidden_size), np.float32)
        for bi, ((segments, fc, cap), total) in enumerate(zip(plans,
                                                              flat_rows)):
            pos = s_buf - total
            pad_start[bi] = pos
            caps[bi] = cap
            for kind, data in segments:
                if kind == "text":
                    text_buf[bi, pos : pos + len(data)] = data
                    pos += len(data)
                else:
                    n = data.shape[1]
                    fe_buf[bi, pos : pos + n] = data[0]
                    is_audio[bi, pos : pos + n] = True
                    pos += n
            if fc is not None:
                feat_cond0[bi] = fc[0]            # pos row
                feat_cond0[bsz + bi] = fc[1]      # neg row

        # latent buffer bucket: the loop cannot exceed max(caps)
        buf = min(dcfg.max_latents,
                  max(32, -(-int(max(caps)) // 32) * 32))
        fkey = ("batch", bsz, s_buf, buf)
        if not hasattr(self, "_batch_fns"):
            self._batch_fns = {}
        if fkey not in self._batch_fns:
            self._batch_fns[fkey] = self._build_decode_batch(bsz, s_buf, buf)

        if self.mesh is not None:
            from ..parallel.mesh import dp_shard

            if bsz % self.mesh.shape["dp"]:
                raise ValueError(f"batch {bsz} not divisible by "
                                 f"dp={self.mesh.shape['dp']}")
            # feat_cond0 is (2B, ...) pos-then-neg: leading-axis dp split
            # keeps halves aligned because 2B % dp == 0
            args = [dp_shard(self.mesh, a) for a in
                    (text_buf, is_audio, pad_start, fe_buf, feat_cond0,
                     caps)]
        else:
            args = [jnp.asarray(text_buf), jnp.asarray(is_audio),
                    np.asarray(pad_start), jnp.asarray(fe_buf),
                    jnp.asarray(feat_cond0), np.asarray(caps)]

        t0 = time.perf_counter()
        wav_dev, done_dev = self._batch_fns[fkey](
            self.params, self.vae_params, *args,
            self._get_key(self.dcfg.seed if seed is None else seed))
        wav, done = jax.device_get((wav_dev, done_dev))
        counts = [int(done[bi]) for bi in range(bsz)]
        wavs: list[np.ndarray | None] = [None] * bsz
        spl = cfg.samples_per_latent
        native = cfg.output_sample_rate
        for bi in range(bsz):
            if counts[bi] == 0:
                wavs[bi] = np.zeros(0, np.int16)
                continue
            w = np.asarray(wav)[bi, : counts[bi] * spl]
            if self.output_sample_rate != native:
                from ..audio.wav import resample_linear

                w = resample_linear(w, native, self.output_sample_rate)
            wavs[bi] = w
        wall = time.perf_counter() - t0
        total_audio = sum(len(w) for w in wavs) / self.output_sample_rate
        stats = {"latents": sum(counts), "wall_s": wall,
                 "audio_s": total_audio,
                 "rtf": wall / max(total_audio, 1e-9)}
        return wavs, stats, counts, [int(c) for c in caps]

    def _vae_dec_fn(self, n: int):
        if n not in self._vae_dec_cache:
            cfg = self.cfg

            sr_idx = int(np.searchsorted(np.asarray(cfg.vae.sr_bins),
                                         cfg.output_sample_rate)) \
                if cfg.vae.sr_bins else 0

            @jax.jit
            def run(vae_params, latents):
                flat = latents.reshape(1, -1, cfg.vae.latent_dim)
                wav = vae_decode(vae_params["dec"], flat, cfg.vae,
                                 sr_idx=sr_idx)
                return (wav * 32767.0).astype(jnp.int16)

            self._vae_dec_cache[n] = run
        return self._vae_dec_cache[n]

    # --------------------------------------------------- streaming decode

    def _build_gen_chunk(self, chunk: int):
        """Generation loop bounded to `chunk` latents with the carry
        round-tripped — the TPU-native version of the reference's
        executor-overlapped pairwise VAE decode (Inference :511-523)."""
        cfg, dcfg = self.cfg, self.dcfg

        def run(params, base_kv, res_kv, dit, feat_cond, key, num, budget):
            latents = jnp.zeros((chunk, cfg.patch_size, cfg.vae.latent_dim))

            def gcond(c):
                _, _, _, _, _, _, n_in, num, fin = c
                return (~fin) & (n_in < chunk) & (num < budget)

            def gbody(c):
                base_kv, res_kv, dit, feat_cond, latents, key, n_in, num, _ = c
                key, sub = jax.random.split(key)
                noise = jax.random.normal(
                    sub, (1, cfg.patch_size, cfg.vae.latent_dim))
                latent = cfm_feat_decoder(params, noise, dit, feat_cond, cfg)
                latents = jax.lax.dynamic_update_slice(
                    latents, latent.astype(latents.dtype), (n_in, 0, 0))
                dt = params["embed"].dtype
                feat_embed, feat_cond = feat_encoder_cond(
                    params, latent.astype(dt), cfg)
                feat_cond = feat_cond.astype(dt)
                h = feat_embed[:, :1].astype(dt)
                dit, stop, base_kv, res_kv = voxcpm_main_step(
                    params, h, h, jnp.int32(0), base_kv, res_kv, cfg,
                    fused=self._fused)
                fin = (stop == 1) & (num + 1 >= dcfg.min_latents)
                return (base_kv, res_kv, dit, feat_cond, latents, key,
                        n_in + 1, num + 1, fin)

            init = (base_kv, res_kv, dit, feat_cond, latents, key,
                    jnp.zeros((), jnp.int32), num, jnp.zeros((), bool))
            (base_kv, res_kv, dit, feat_cond, latents, key, n_in, num,
             fin) = jax.lax.while_loop(gcond, gbody, init)
            return base_kv, res_kv, dit, feat_cond, latents, key, n_in, num, fin

        return jax.jit(run)

    def synthesize_streaming(self, segments, feat_cond, max_steps: int,
                             seed: int | None = None, chunk: int = 4):
        """Generator of int16 audio chunks: run the generation loop in
        `chunk`-latent slices and VAE-decode pairs with one latent of left
        context discarded (the reference's half-overlap pairwise decode,
        Inference :562-580). `segments`/`feat_cond` as in _run_segments."""
        from .streaming import ChunkedCodecStream

        cfg, dcfg = self.cfg, self.dcfg
        cap = MAX_PREFILL_TOKENS + MAX_PROMPT_FEATS
        text_buf = np.zeros((1, cap), np.int32)
        fe_buf = np.zeros((1, cap, cfg.base.hidden_size), np.float32)
        is_audio = np.zeros((cap,), bool)
        pos = 0
        for kind, data in segments:
            if kind == "text":
                n = len(data)
                text_buf[0, pos:pos + n] = data
            else:
                n = data.shape[1]
                fe_buf[:, pos:pos + n] = np.asarray(data)
                is_audio[pos:pos + n] = True
            pos += n

        if not hasattr(self, "_prefill_only_fn") or self._prefill_only_fn is None:
            cfg_ = self.cfg
            b = cfg_.base

            def prefill(params, text_buf, is_audio, prefill_len, fe_buf,
                        feat_cond0):
                dt = params["embed"].dtype
                fe = fe_buf.astype(dt)
                base_kv = KVCache.create(b.num_layers, 1, b.num_kv_heads,
                                         b.max_seq_len, b.head_dim, dt)
                res_kv = KVCache.create(cfg_.residual.num_layers, 1,
                                        cfg_.residual.num_kv_heads,
                                        b.max_seq_len,
                                        cfg_.residual.head_dim, dt)

                # batched prefill over the padded bucket (see
                # _build_decode) with KV rewind to the true length
                h = jnp.where(is_audio[None, :, None], fe,
                              params["embed"][text_buf])
                dit, _, base_kv, res_kv = voxcpm_main_step(
                    params, h, fe, is_audio, base_kv, res_kv, cfg_,
                    valid_len=prefill_len)
                base_kv = base_kv.rewind(prefill_len)
                res_kv = res_kv.rewind(prefill_len)
                return base_kv, res_kv, dit, feat_cond0.astype(dt)

            self._prefill_only_fn = jax.jit(prefill)

        key = ("gen_chunk", chunk)
        if key not in self._vae_dec_cache:
            self._vae_dec_cache[key] = self._build_gen_chunk(chunk)
        gen_fn = self._vae_dec_cache[key]

        up = cfg.samples_per_latent   # native decoder rate (no resample
        # on the streaming path — chunks are at cfg.output_sample_rate)
        stream = ChunkedCodecStream(
            lambda lat: self._vae_dec_fn(lat.shape[1])(
                self.vae_params,
                jnp.asarray(lat[0].astype(np.float32))),
            window=chunk + 1, left_context=1, upsample=up,
            num_groups=cfg.patch_size)

        # np scalars ride the fast jit-argument path (per-call jnp scalar
        # creation costs ~30 ms over a remote-device tunnel); keys are cached
        base_kv, res_kv, dit, feat_cond = self._prefill_only_fn(
            self.params, jnp.asarray(text_buf), jnp.asarray(is_audio),
            np.int32(pos), jnp.asarray(fe_buf), feat_cond)
        rng_key = self._get_key(self.dcfg.seed if seed is None else seed)
        num = np.int32(0)
        budget = np.int32(min(max_steps, dcfg.max_latents))
        while True:
            (base_kv, res_kv, dit, feat_cond, latents, rng_key, n_in, num,
             fin) = gen_fn(self.params, base_kv, res_kv, dit, feat_cond,
                           rng_key, num, budget)
            n = int(n_in)
            if n > 0:
                out = stream.push_frames(np.asarray(latents)[:n])
                if out is not None and len(out):
                    yield out
            if bool(fin) or int(num) >= int(budget) or n == 0:
                break
        for out in stream.finish():
            if len(out):
                yield out

    # -------------------------------------------------------------- public

    def _run_segments(self, segments, feat_cond, max_steps: int,
                      seed: int | None) -> tuple[np.ndarray, dict]:
        """segments: list of ('text', ids (T,)) / ('audio', feat_embed
        (1, T, H)) in prompt order. Runs prefill + generation + VAE decode."""
        cfg, dcfg = self.cfg, self.dcfg
        cap = MAX_PREFILL_TOKENS + MAX_PROMPT_FEATS
        pos = sum(len(d) if kind == "text" else d.shape[1]
                  for kind, d in segments)
        if pos > cap:
            raise ValueError(f"prompt too long: {pos} > {cap}")
        # prefill bucket: a fixed 512-position buffer uploads a 2 MB fp32
        # feat buffer over the tunnel and runs the dual-LM over 512
        # positions for a typical ~50-token prompt; bucket to 64s instead
        s_buf = min(cap, max(64, -(-pos // 64) * 64))
        text_buf = np.zeros((1, s_buf), np.int32)
        is_audio = np.zeros((s_buf,), bool)
        has_audio = any(kind == "audio" for kind, _ in segments)
        fe_np = (np.zeros((1, s_buf, cfg.base.hidden_size), np.float32)
                 if has_audio else None)
        p = 0
        for kind, data in segments:
            if kind == "text":
                n = len(data)
                text_buf[0, p:p + n] = data
            else:
                n = data.shape[1]
                fe_np[:, p:p + n] = np.asarray(data)
                is_audio[p:p + n] = True
            p += n
        # all-zero feat buffers fill on-device instead of uploading
        fe_buf = (jnp.asarray(fe_np) if has_audio else
                  jnp.zeros((1, s_buf, cfg.base.hidden_size), jnp.float32))

        # latent-buffer bucket: 32-latent granularity, capped at max_latents
        buf = min(dcfg.max_latents, max(32, -(-max_steps // 32) * 32))
        dec_fn = self._dec_cache.get(buf)
        if dec_fn is None:
            dec_fn = self._dec_cache[buf] = self._build_decode(buf)
        base_seed = self.dcfg.seed if seed is None else seed

        t0 = time.perf_counter()
        for attempt in range(self.dcfg.retry_badcase + 1):
            key = self._get_key(base_seed + attempt)
            wav_dev, num_dev = dec_fn(
                self.params, self.vae_params, jnp.asarray(text_buf),
                jnp.asarray(is_audio), np.int32(pos), fe_buf,
                feat_cond, np.int32(max_steps), key)
            # one combined fetch: wav + num in the same round trip
            wav, num = jax.device_get((wav_dev, num_dev))
            num = int(num)
            cap = min(max_steps, buf)
            if num < cap or attempt == self.dcfg.retry_badcase:
                break   # stopped naturally (or retries exhausted)
        if num == 0:
            return np.zeros(0, np.int16), {"latents": 0, "wall_s": 0.0}

        n_samples = num * cfg.samples_per_latent
        wav = np.asarray(wav)[0, :n_samples]
        native = cfg.output_sample_rate   # v2 decodes 48 kHz natively
        if self.output_sample_rate != native:
            from ..audio.wav import resample_linear

            wav = resample_linear(wav, native, self.output_sample_rate)
        wall = time.perf_counter() - t0
        return wav, {"latents": num, "wall_s": wall,
                     "sample_rate": self.output_sample_rate,
                     "rtf": wall / max(n_samples / native, 1e-9)}

    # -------------------------------------------------------------- public

    def synthesize_ids(self, prompt_ids: np.ndarray, target_ids: np.ndarray,
                       prompt_audio: np.ndarray | None = None,
                       seed: int | None = None) -> tuple[np.ndarray, dict]:
        """v1.5 layout (VOXCPM_PREFILL :283-298):
        [prompt_text | target_text | audio_start | prompt feats]."""
        cfg, dcfg = self.cfg, self.dcfg
        segments: list = [
            ("text", np.concatenate(
                [prompt_ids[0], target_ids[0], [cfg.audio_start_id]]
            ).astype(np.int32)),
        ]
        if prompt_audio is not None and len(prompt_audio) > 0:
            _, feat_embed, feat_cond = self.encode_prompt(prompt_audio)
            segments.append(("audio", feat_embed))
        else:
            feat_cond = jnp.zeros((2, cfg.patch_size,
                                   cfg.estimator.hidden_size))
        max_steps = target_ids.shape[1] * dcfg.decode_limit_factor + 10
        return self._run_segments(segments, feat_cond, max_steps, seed)

    def synthesize_v2(self, mode: str, target_ids: np.ndarray,
                      ref_audio: np.ndarray | None = None,
                      prompt_audio: np.ndarray | None = None,
                      prompt_ids: np.ndarray | None = None,
                      ref_start_id: int = 103, ref_end_id: int = 104,
                      seed: int | None = None) -> tuple[np.ndarray, dict]:
        """VoxCPM-2 prompt modes (v2 Export:46-87, Assemble graphs
        :1014-1115):
          voice_design   — text only, voice from the instruction;
          reference_only — [ref_start | ref feats | ref_end | text];
          continuation   — [prompt_text + target_text | prompt feats];
          combined       — [ref_start | ref feats | ref_end | text | prompt
                            feats]."""
        cfg, dcfg = self.cfg, self.dcfg
        zero_cond = jnp.zeros((2, cfg.patch_size, cfg.estimator.hidden_size))

        def enc(audio):
            _, fe, fc = self.encode_prompt(audio)
            return fe, fc

        target = target_ids[0].astype(np.int32)
        segments: list = []
        feat_cond = zero_cond
        if mode == "voice_design":
            segments = [("text", target)]
        elif mode == "reference_only":
            if ref_audio is None:
                raise ValueError("reference_only needs ref_audio")
            ref_fe, _ = enc(ref_audio)
            segments = [("text", np.array([ref_start_id], np.int32)),
                        ("audio", ref_fe),
                        ("text", np.array([ref_end_id], np.int32)),
                        ("text", target)]
        elif mode == "continuation":
            if prompt_audio is None or prompt_ids is None:
                raise ValueError("continuation needs prompt_audio + prompt_ids")
            p_fe, feat_cond = enc(prompt_audio)
            segments = [("text", np.concatenate(
                [prompt_ids[0].astype(np.int32), target])),
                ("audio", p_fe)]
        elif mode == "combined":
            if ref_audio is None or prompt_audio is None or prompt_ids is None:
                raise ValueError("combined needs ref + prompt audio + ids")
            ref_fe, _ = enc(ref_audio)
            p_fe, feat_cond = enc(prompt_audio)
            segments = [("text", np.array([ref_start_id], np.int32)),
                        ("audio", ref_fe),
                        ("text", np.array([ref_end_id], np.int32)),
                        ("text", np.concatenate(
                            [prompt_ids[0].astype(np.int32), target])),
                        ("audio", p_fe)]
        else:
            raise ValueError(f"unknown mode {mode!r}")
        max_steps = len(target) * dcfg.decode_limit_factor + 10
        return self._run_segments(segments, feat_cond, max_steps, seed)
