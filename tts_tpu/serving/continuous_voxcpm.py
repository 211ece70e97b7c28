"""Slot-based continuous batching for the VoxCPM dual-LM decode.

Family adapter over serving/slots.SlotEngine. Each chunk step runs the
FULL VoxCPM generation step per row: CFM feat decode (10-step scan,
st_star CFG over the [pos | neg] feat_cond halves) -> latent write ->
feat encoder -> dual-LM (base + FSQ bottleneck + residual) step. Unlike
the batched entry point (one PRNG key for the whole batch,
runtime/voxcpm.py:269), every slot carries its OWN key chain, split
once per generated latent exactly like the solo decode — so a request
reproduces its solo output regardless of when it was admitted.

Shared-kv-position invariant: rope is relative (llama stacks), so a
row's one-row offset prefill at the batch's current position computes
what it would compute alone (the same constant-shift argument the
batched right-justified layout already relies on,
runtime/voxcpm.py:221-230). The VAE decode at finalize is causal, so
the per-row zero-masked latent buffer decodes prefix-stably at the
server bucket.

NOTES.md argued the fused prefill+gen+VAE single-dispatch design made
a chunked VoxCPM variant questionable; this adapter re-opens that seam
ONLY for serving (solo synthesis keeps the fused path) — the chunk
boundary is what buys mid-decode admission.

The reference runs one request at a time (SURVEY §3); continuous
serving is beyond-reference. Retry-on-badcase stays with the solo path
(reference core.py:140-142): a slot row that hits its cap resolves with
the capped audio.
"""
from __future__ import annotations

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from .slots import SlotEngine, StreamHandle

__all__ = ["VoxCPMSlotServer"]


class VoxCPMSlotServer(SlotEngine):
    """Continuous-batching server over a VoxCPMPipeline (v1.5 layout).

    submit(prompt_ids, target_ids, prompt_audio=None) -> Future
    resolving to (int16 wav, n_latents).
    """

    def __init__(self, pipeline, *, slots: int = 4, chunk: int = 8,
                 prompt_bucket: int = 64, max_seq_len: int | None = None,
                 queue_limit: int = 256):
        self.pipe = pipeline
        self.cfg = pipeline.cfg
        self.dcfg = pipeline.dcfg
        cfg = self.cfg
        self.sb = -(-prompt_bucket // 16) * 16
        self.fbuf = self.dcfg.max_latents
        kv_max = min(max_seq_len or cfg.base.max_seq_len,
                     cfg.base.max_seq_len)
        kv_max = (kv_max // 128) * 128 or kv_max
        if self.sb + self.fbuf + chunk > kv_max:
            raise ValueError(
                f"kv budget {kv_max} too small for bucket {self.sb} + "
                f"max_latents {self.fbuf} + chunk {chunk}")
        self.kv_max = kv_max
        self.sr_idx = int(np.searchsorted(np.asarray(cfg.vae.sr_bins),
                                          cfg.output_sample_rate)) \
            if cfg.vae.sr_bins else 0
        self._slots = slots
        self._build_programs(slots, chunk)
        super().__init__(slots=slots, chunk=chunk, seq_limit=kv_max,
                         start_pos=self.sb, queue_limit=queue_limit,
                         name="voxcpm-slot-server")

    # ----------------------------------------------------------- programs

    def _build_programs(self, bsz: int, chunk: int):
        from ..models.voxcpm import (cfm_feat_decoder_batch,
                                     feat_encoder_cond_batch,
                                     voxcpm_main_step)

        cfg, dcfg = self.cfg, self.dcfg
        b = cfg.base
        sb, fbuf, kv_max = self.sb, self.fbuf, self.kv_max
        min_latents = dcfg.min_latents
        rows = jnp.arange(bsz)

        def chunk_fn(params, base_kv, res_kv, dit, feat_cond, latents,
                     key_data, cnt, fin, done, kvf, cap_vec):
            dt = params["embed"].dtype
            kv_idx = jnp.arange(kv_max)[None, :]
            kv_valid = kv_idx >= kvf[:, None]

            def body(_, c):
                base_kv, res_kv, dit, feat_cond, latents, keys, cnt, \
                    fin, done = c
                ks = jax.vmap(jax.random.split)(keys)          # (B, 2)
                keys, subs = ks[:, 0], ks[:, 1]
                # (1, P, L) then [0]: the exact per-request bit pattern of
                # the solo decode's normal(sub, (1, P, L))
                noise = jax.vmap(lambda k: jax.random.normal(
                    k, (1, cfg.patch_size, cfg.vae.latent_dim))[0])(subs)
                latent = cfm_feat_decoder_batch(params, noise, dit,
                                                feat_cond, cfg)
                cur = jnp.minimum(cnt, fbuf - 1)
                latents = latents.at[rows, cur].set(
                    jnp.where(fin[:, None, None],
                              latents[rows, cur],
                              latent.astype(latents.dtype)))
                feat_embed, feat_cond = feat_encoder_cond_batch(
                    params, latent.astype(dt), cfg)
                h2 = feat_embed.astype(dt) * (~fin)[:, None, None]
                dit, stop, base_kv, res_kv = voxcpm_main_step(
                    params, h2, h2, jnp.int32(0), base_kv, res_kv, cfg,
                    kv_valid=kv_valid, fused=self.pipe._fused)
                newly = (((stop == 1) & (cnt + 1 >= min_latents))
                         | (cnt + 1 >= cap_vec)) & (~fin)
                done = jnp.where(newly, cnt + 1, done)
                cnt = jnp.where(fin, cnt, cnt + 1)
                return (base_kv, res_kv, dit, feat_cond, latents, keys,
                        cnt, fin | newly, done)

            (base_kv, res_kv, dit, feat_cond, latents, keys, cnt, fin,
             done) = jax.lax.fori_loop(
                0, chunk, body, (base_kv, res_kv, dit, feat_cond, latents,
                                 jax.random.wrap_key_data(key_data), cnt,
                                 fin, done))
            return (base_kv, res_kv, dit, feat_cond, latents,
                    jax.random.key_data(keys), cnt, fin, done)

        self._chunk_fn = jax.jit(
            chunk_fn, donate_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))

        def prefill_fn(params, text_buf, is_audio, pad_start, fe_buf,
                       base_pos):
            """One-row offset prefill: the segmented [text | audio feats]
            prompt right-justified in [base_pos - sb, base_pos), left pad
            masked (embeds zeroed + kv_valid); rope continues the shared
            counter (relative-offset invariance)."""
            dt = params["embed"].dtype
            fe_buf = fe_buf.astype(dt)
            base_kv1 = KVCache.create(b.num_layers, 1, b.num_kv_heads,
                                      kv_max, b.head_dim, dt)
            res_kv1 = KVCache.create(cfg.residual.num_layers, 1,
                                     cfg.residual.num_kv_heads, kv_max,
                                     cfg.residual.head_dim, dt)
            start = (base_pos - sb).astype(jnp.int32)
            base_kv1 = dc.replace(base_kv1, length=start)
            res_kv1 = dc.replace(res_kv1, length=start)
            valid = jnp.arange(sb)[None, :] >= pad_start
            kv_idx = jnp.arange(kv_max)[None, :]
            kv_valid = kv_idx >= (start + pad_start)
            h = jnp.where(is_audio[..., None], fe_buf,
                          params["embed"][text_buf])
            h = h * valid[..., None]
            dit, _stop, base_kv1, res_kv1 = voxcpm_main_step(
                params, h, fe_buf, is_audio, base_kv1, res_kv1, cfg,
                kv_valid=kv_valid)
            return base_kv1, res_kv1, dit

        self._prefill_fn = jax.jit(prefill_fn)

        def insert_fn(base_kv, res_kv, dit, feat_cond, base1, res1, dit1,
                      fc1, slot):
            def put(kv, kv1):
                k = jax.lax.dynamic_update_slice(kv.k, kv1.k,
                                                 (0, slot, 0, 0, 0))
                v = jax.lax.dynamic_update_slice(kv.v, kv1.v,
                                                 (0, slot, 0, 0, 0))
                return dc.replace(kv, k=k, v=v,
                                  length=jnp.maximum(kv.length, kv1.length))

            base_kv = put(base_kv, base1)
            res_kv = put(res_kv, res1)
            dit = jax.lax.dynamic_update_slice(
                dit, dit1.astype(dit.dtype), (slot, 0, 0))
            # feat_cond rides [pos rows | neg rows] (2B, P, H)
            feat_cond = jax.lax.dynamic_update_slice(
                feat_cond, fc1[:1].astype(feat_cond.dtype), (slot, 0, 0))
            feat_cond = jax.lax.dynamic_update_slice(
                feat_cond, fc1[1:].astype(feat_cond.dtype),
                (slot + bsz, 0, 0))
            return base_kv, res_kv, dit, feat_cond

        self._insert_fn = jax.jit(insert_fn, donate_argnums=(0, 1, 2, 3))

        def vocode_fn(vae_params, latents_row, n):
            from ..models.voxcpm import vae_decode

            live = (jnp.arange(fbuf) < n)[:, None, None]
            flat = (latents_row * live).reshape(1, -1, cfg.vae.latent_dim)
            wav = vae_decode(vae_params["dec"], flat, cfg.vae,
                             sr_idx=self.sr_idx)
            return (wav * 32767.0).astype(jnp.int16)

        self._vocode_fn = jax.jit(vocode_fn)

        def lat_win_fn(latents, row, start):
            """Fixed-shape window of one row's latents — the small fetch
            streaming rows make per chunk (a full (B, fbuf, P, L) fetch
            would move MBs over a remote-device tunnel every chunk)."""
            return jax.lax.dynamic_slice(
                latents, (row, start, 0, 0),
                (1, min(chunk, fbuf), cfg.patch_size, cfg.vae.latent_dim))

        self._lat_win_fn = jax.jit(lat_win_fn)

    # ------------------------------------------------------------- client

    def submit(self, prompt_ids: np.ndarray, target_ids: np.ndarray,
               prompt_audio: np.ndarray | None = None,
               seed: int | None = None,
               deadline_s: float | None = None):
        """v1.5 layout: [prompt_text | target_text | audio_start
        (| prompt feats)]. Builds the segment plan synthesize_ids_batch
        builds (runtime/voxcpm.py:328-337) and routes to
        submit_segments."""
        cfg, dcfg = self.cfg, self.dcfg
        flat = np.concatenate(
            [prompt_ids[0], target_ids[0],
             [cfg.audio_start_id]]).astype(np.int32)
        segments: list = [("text", flat)]
        fc = None
        if prompt_audio is not None and len(prompt_audio):
            _, fe, fc = self.pipe.encode_prompt(prompt_audio)
            segments.append(("audio", np.asarray(fe, np.float32)))
            fc = np.asarray(fc, np.float32)
        cap = int(min(target_ids.shape[1] * dcfg.decode_limit_factor + 10,
                      dcfg.max_latents))
        return self.submit_segments(segments, fc, cap, seed,
                                    deadline_s=deadline_s)

    def submit_stream(self, prompt_ids: np.ndarray, target_ids: np.ndarray,
                      prompt_audio: np.ndarray | None = None,
                      seed: int | None = None,
                      window: int | None = None,
                      left_context: int = 1) -> StreamHandle:
        """Streaming variant of submit(): a StreamHandle iterating int16
        chunks (at cfg.output_sample_rate) as chunk boundaries produce
        latents — concurrent streams share the slot batch instead of each
        holding a solo decode loop. Same pairwise overlap-discard VAE
        window semantics as the solo synthesize_streaming (reference
        VoxCPM/v1.5/Inference_VoxCPM_ONNX.py:511-523): with window =
        server chunk + 1 / left_context = 1 (the defaults) the stream
        byte-equals synthesize_streaming(chunk=server.chunk)."""
        cfg, dcfg = self.cfg, self.dcfg
        flat = np.concatenate(
            [prompt_ids[0], target_ids[0],
             [cfg.audio_start_id]]).astype(np.int32)
        segments: list = [("text", flat)]
        fc = None
        if prompt_audio is not None and len(prompt_audio):
            _, fe, fc = self.pipe.encode_prompt(prompt_audio)
            segments.append(("audio", np.asarray(fe, np.float32)))
            fc = np.asarray(fc, np.float32)
        cap = int(min(target_ids.shape[1] * dcfg.decode_limit_factor + 10,
                      dcfg.max_latents))
        return self.submit_segments_stream(segments, fc, cap, seed,
                                           window=window,
                                           left_context=left_context)

    def submit_segments_stream(self, segments, feat_cond=None,
                               max_latents: int | None = None,
                               seed: int | None = None,
                               window: int | None = None,
                               left_context: int = 1) -> StreamHandle:
        """Streaming submit_segments (v2 Assemble-mode plans stream too)."""
        window = self.chunk + 1 if window is None else window
        if left_context >= window:
            raise ValueError(f"left_context {left_context} >= window "
                             f"{window}; raise window")
        handle = StreamHandle()
        fut = self.submit_segments(segments, feat_cond, max_latents, seed,
                                   _stream=(handle, window, left_context))
        fut.add_done_callback(
            lambda f: handle._fail(f.exception() or RuntimeError(
                "request cancelled"))
            if (f.cancelled() or f.exception()) else None)
        return handle

    def submit_segments(self, segments, feat_cond=None,
                        max_latents: int | None = None,
                        seed: int | None = None, _stream=None,
                        deadline_s: float | None = None):
        """Generic segmented prompt — the v2 Assemble modes' plan format
        (runtime/voxcpm._run_segments): list of ('text', ids (T,)) /
        ('audio', feat_embed (1, T, H)) in prompt order, with optional
        CFG feat_cond (2, P, est_H)."""
        cfg, dcfg = self.cfg, self.dcfg
        total = sum(len(d) if kind == "text" else d.shape[1]
                    for kind, d in segments)
        if total > self.sb:
            raise ValueError(f"prompt {total} > bucket {self.sb}")
        pos = self.sb - total
        text_buf = np.zeros((1, self.sb), np.int32)
        is_audio = np.zeros((1, self.sb), bool)
        fe_buf = np.zeros((1, self.sb, cfg.base.hidden_size), np.float32)
        p = pos
        for kind, data in segments:
            if kind == "text":
                n = len(data)
                text_buf[0, p:p + n] = data
            else:
                n = data.shape[1]
                fe_buf[0, p:p + n] = np.asarray(data)[0]
                is_audio[0, p:p + n] = True
            p += n
        fc0 = np.zeros((2, cfg.patch_size, cfg.estimator.hidden_size),
                       np.float32)
        if feat_cond is not None:
            fc0[0], fc0[1] = feat_cond[0], feat_cond[1]
        cap = int(min(max_latents or dcfg.max_latents, dcfg.max_latents))
        key = self.pipe._get_key(dcfg.seed if seed is None else seed)
        payload = ((text_buf, is_audio, np.int32(pos), fe_buf, fc0,
                    np.asarray(jax.random.key_data(key))), _stream)
        return self._submit(payload, cap, deadline_s=deadline_s)

    # ------------------------------------------------------ engine hooks

    def _fresh(self):
        bsz, cfg = self._slots, self.cfg
        dt = self.pipe.params["embed"].dtype
        kd = np.asarray(jax.random.key_data(
            jax.random.split(jax.random.key(0), bsz)))
        return {
            "base_kv": KVCache.create(cfg.base.num_layers, bsz,
                                      cfg.base.num_kv_heads, self.kv_max,
                                      cfg.base.head_dim, dt),
            "res_kv": KVCache.create(cfg.residual.num_layers, bsz,
                                     cfg.residual.num_kv_heads, self.kv_max,
                                     cfg.residual.head_dim, dt),
            "dit": jnp.zeros((bsz, 1, cfg.estimator.hidden_size), dt),
            "feat_cond": jnp.zeros((2 * bsz, cfg.patch_size,
                                    cfg.estimator.hidden_size), dt),
            "latents": jnp.zeros((bsz, self.fbuf, cfg.patch_size,
                                  cfg.vae.latent_dim), jnp.float32),
            "key_data": jnp.asarray(kd),
            "cnt": jnp.zeros((bsz,), jnp.int32),
            "fin": jnp.ones((bsz,), bool),
            "done": jnp.zeros((bsz,), jnp.int32),
            "kvf": np.zeros((bsz,), np.int32),
            "cap": np.zeros((bsz,), np.int32),
            "stream": [None] * bsz,   # {handle, codec, prev} per slot
        }

    def _fin_done(self, s):
        return jax.device_get((s["fin"], s["done"]))

    def _latents_window(self, s, b: int, prev: int, new: int) -> np.ndarray:
        """Host copy of row b's latents [prev:new) via the fixed-shape
        window slice (new - prev <= chunk between chunk boundaries)."""
        start = max(0, min(prev, self.fbuf - min(self.chunk, self.fbuf)))
        win = np.asarray(self._lat_win_fn(s["latents"], np.int32(b),
                                          np.int32(start)))[0]
        return win[prev - start: new - start]

    def _post_chunk(self, s) -> None:
        if not any(st is not None for st in s["stream"]):
            return
        cnt = np.asarray(s["cnt"])          # one small fetch for all rows
        for b, st in enumerate(s["stream"]):
            if st is None:
                continue
            new = int(cnt[b])
            if new > st["prev"]:
                lats = self._latents_window(s, b, st["prev"], new)
                st["prev"] = new
                out = st["codec"].push_frames(lats)
                if out is not None and len(out):
                    st["handle"]._put(out)

    def _finalize(self, s, b: int, n: int):
        st = s["stream"][b]
        if st is not None:
            s["stream"][b] = None
            if n > st["prev"]:
                lats = self._latents_window(s, b, st["prev"], n)
                out = st["codec"].push_frames(lats)
                if out is not None and len(out):
                    st["handle"]._put(out)
            for out in st["codec"].finish():
                if len(out):
                    st["handle"]._put(out)
            st["handle"]._close(n)
            return None, n
        if n <= 0:
            return np.zeros(0, np.int16), 0
        wav = np.asarray(self._vocode_fn(
            self.pipe.vae_params, s["latents"][b], np.int32(n)))
        spl = self.cfg.samples_per_latent
        w = wav[0, : n * spl]
        native = self.cfg.output_sample_rate
        if self.pipe.output_sample_rate != native:
            from ..audio.wav import resample_linear

            w = resample_linear(w, native, self.pipe.output_sample_rate)
        return w, n

    def _admit_row(self, s, b: int, payload, cap: int) -> None:
        (text_buf, is_audio, pad_start, fe_buf, fc0, key_data), stream = \
            payload
        if stream is not None:
            from ..runtime.streaming import ChunkedCodecStream

            handle, window, left_context = stream
            s["stream"][b] = {
                "handle": handle, "prev": 0,
                # same VAE window program as the solo streaming path
                # (runtime/voxcpm.synthesize_streaming) for byte-equality
                "codec": ChunkedCodecStream(
                    lambda lat: self.pipe._vae_dec_fn(lat.shape[1])(
                        self.pipe.vae_params,
                        jnp.asarray(lat[0].astype(np.float32))),
                    window=window, left_context=left_context,
                    upsample=self.cfg.samples_per_latent,
                    num_groups=self.cfg.patch_size),
            }
        else:
            s["stream"][b] = None
        base1, res1, dit1 = self._prefill_fn(
            self.pipe.params, text_buf, is_audio, pad_start, fe_buf,
            np.int32(s["pos"]))
        s["base_kv"], s["res_kv"], s["dit"], s["feat_cond"] = \
            self._insert_fn(s["base_kv"], s["res_kv"], s["dit"],
                            s["feat_cond"], base1, res1, dit1,
                            jnp.asarray(fc0), np.int32(b))
        s["latents"] = s["latents"].at[b].set(0.0)
        s["key_data"] = s["key_data"].at[b].set(jnp.asarray(key_data))
        s["cnt"] = s["cnt"].at[b].set(0)
        s["fin"] = s["fin"].at[b].set(False)
        s["done"] = s["done"].at[b].set(cap)
        s["kvf"][b] = s["pos"] - (self.sb - int(pad_start))
        s["cap"][b] = cap

    def _step_chunk(self, s) -> None:
        (s["base_kv"], s["res_kv"], s["dit"], s["feat_cond"], s["latents"],
         s["key_data"], s["cnt"], s["fin"], s["done"]) = self._chunk_fn(
            self.pipe.params, s["base_kv"], s["res_kv"], s["dit"],
            s["feat_cond"], s["latents"], s["key_data"], s["cnt"],
            s["fin"], s["done"], jnp.asarray(s["kvf"]),
            jnp.asarray(s["cap"]))
