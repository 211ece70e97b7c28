"""Slot-based continuous batching for the Qwen3-TTS two-level decode.

Family adapter over serving/slots.SlotEngine. Each chunk step runs the
FULL two-level frame: talker logits (+ per-row repetition penalty over
the row's own token0 history) -> greedy token0 -> 15-group predictor
(greedy scan or per-request beams, runtime/qwen._predictor_batch) ->
TTS_EMBED_C next-input assembly -> one talker stack step. Per-row
trailing-text buffers ride in the batch state so each row gathers its
own next text embedding at its own frame cursor.

Admission runs a one-row offset prefill: the prompt embeds are
right-justified at the batch's current shared kv position with rope
positions continued from the shared counter (rope attention sees only
relative offsets — the same invariance argument as the batched prefill
layout, runtime/qwen.py:326-346) and the row's KV/hid/trailing are
spliced into the live state. A finished row's frames decode through the
12 Hz codec on device (frame buffer sliced/masked in-graph).

The reference runs one request at a time through ~60 session calls per
frame (Export_Qwen_TTS_ONNX.py:2622-2732); continuous serving is a
beyond-reference capability.
"""
from __future__ import annotations

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from ..kv.cache import KVCache
from .slots import SlotEngine, StreamHandle

__all__ = ["QwenSlotServer"]


class QwenSlotServer(SlotEngine):
    """Continuous-batching server over a QwenTTSPipeline.

    submit(prefill, trailing) -> Future resolving to (int16 wav, n_frames).
    prefill (1, P, H) / trailing (1, Tt, H) float32 — the pipeline's
    build_prefill_embeds / build_prefill_voice_clone output.
    """

    def __init__(self, pipeline, *, slots: int = 4, chunk: int = 16,
                 prompt_bucket: int = 256, trailing_bucket: int = 64,
                 max_seq_len: int | None = None, queue_limit: int = 256):
        self.pipe = pipeline
        self.cfg = pipeline.cfg
        self.ccfg = pipeline.codec_cfg
        self.dcfg = pipeline.dcfg
        t = self.cfg.talker
        self.bucket = prompt_bucket
        self.tb = trailing_bucket
        self.fbuf = self.dcfg.max_frames
        rope_len = int(pipeline.params["rope_cos"].shape[0])
        kv_max = min(max_seq_len or t.max_seq_len, t.max_seq_len, rope_len)
        kv_max = (kv_max // 128) * 128 or kv_max
        if self.bucket + self.fbuf + chunk > kv_max:
            raise ValueError(
                f"kv budget {kv_max} too small for bucket {self.bucket} + "
                f"max_frames {self.fbuf} + chunk {chunk}; lower max_frames "
                f"or raise max_seq_len")
        self.kv_max = kv_max
        self._slots = slots
        self._voc_cache: dict = {}
        self._build_programs(slots, chunk)
        super().__init__(slots=slots, chunk=chunk, seq_limit=kv_max,
                         start_pos=self.bucket, queue_limit=queue_limit,
                         name="qwen-slot-server")

    # ----------------------------------------------------------- programs

    def _build_programs(self, bsz: int, chunk: int):
        from ..models.qwen_tts import (next_talker_input_batch,
                                       qwen3_stack_step, talker_logits)

        cfg, dcfg = self.cfg, self.dcfg
        t = cfg.talker
        fbuf, kv_max = self.fbuf, self.kv_max
        penalty, prange = dcfg.repeat_penalty, dcfg.penalty_range
        use_penalty = penalty != 1.0
        rows = jnp.arange(bsz)

        def row_penalty(logits, save0, cnt):
            """Per-row window [cnt-R, cnt) over the row's own token0
            history, engaged once the window is full — the per-row analog
            of decoding/sampling.apply_repetition_penalty (which takes a
            scalar cursor shared by all rows)."""
            r = min(prange, fbuf)
            offs = jnp.arange(r)[None, :]
            start = jnp.maximum(cnt - r, 0)[:, None]
            idx = jnp.minimum(start + offs, fbuf - 1)
            window = save0[rows[:, None], idx]
            live = (cnt >= r)[:, None]
            vals = jnp.where(live, logits[rows[:, None], window] * penalty,
                             logits[rows[:, None], window])
            return logits.at[rows[:, None], window].set(vals)

        def chunk_fn(params, kv, hid, frames, save0, cnt, fin, done,
                     trailing, kvf, cap_vec):
            kv_idx = jnp.arange(kv_max)[None, :]
            kv_valid = kv_idx >= kvf[:, None]            # (B, kv_max)
            trailing_minus = trailing.shape[1] - 1

            def body(_, c):
                kv, hid, frames, save0, cnt, fin, done = c
                logits = talker_logits(params, hid, cfg)   # (B, V)
                if use_penalty:
                    logits = row_penalty(logits, save0, cnt)
                tok0 = jnp.argmax(logits, -1).astype(jnp.int32)
                newly_eos = (tok0 == cfg.codec_eos_token_id) & (~fin)
                done = jnp.where(newly_eos, cnt, done)
                fin_e = fin | newly_eos
                tok0 = jnp.where(fin_e, cfg.codec_pad_id, tok0)
                cur = jnp.minimum(cnt, fbuf - 1)
                save0 = save0.at[rows, cur].set(
                    jnp.where(fin_e, save0[rows, cur], tok0))

                frame_ids, ce0 = self.pipe._predictor_batch(
                    params, hid[:, None], tok0, cfg, bsz)  # (B, G)
                frames = frames.at[rows, cur].set(
                    jnp.where(fin_e[:, None], frames[rows, cur], frame_ids))

                hit_cap = (~fin_e) & (cnt + 1 >= cap_vec)
                done = jnp.where(hit_cap, cnt + 1, done)
                new_fin = fin_e | hit_cap
                gather = jnp.minimum(cnt, trailing_minus)  # (B,)
                nxt = next_talker_input_batch(params, frame_ids, ce0,
                                              trailing, gather, cfg)
                nxt = nxt * (~new_fin)[:, None, None]      # dead rows: zeros
                pos = kv.length
                rc = jax.lax.dynamic_slice(params["rope_cos"], (pos, 0),
                                           (1, t.head_dim))
                rs = jax.lax.dynamic_slice(params["rope_sin"], (pos, 0),
                                           (1, t.head_dim))
                hid, kv = qwen3_stack_step(params["talker"], nxt, kv, t,
                                           rc, rs, kv_valid=kv_valid,
                                           fused=self.pipe._fused)
                cnt = jnp.where(fin_e, cnt, cnt + 1)
                return kv, hid, frames, save0, cnt, new_fin, done

            return jax.lax.fori_loop(
                0, chunk, body, (kv, hid, frames, save0, cnt, fin, done))

        self._chunk_fn = jax.jit(
            chunk_fn, donate_argnums=(1, 2, 3, 4, 5, 6, 7))

        def prefill_fn(params, buf, pad_start, base_pos):
            """One-row offset prefill: prompt right-justified in
            [base_pos - bucket, base_pos) with rope positions continued
            from the shared counter; left pad masked via kv_valid and
            zeroed embeds. Returns (kv1, hid1) — hid at the last (true)
            position."""
            dt = params["talker_codec_embed"].dtype
            buf = buf.astype(dt)
            pb = buf.shape[1]
            valid = jnp.arange(pb)[None, :] >= pad_start
            buf = buf * valid[..., None]
            kv1 = KVCache.create(t.num_layers, 1, t.num_kv_heads,
                                 kv_max, t.head_dim, dt)
            kv1 = dc.replace(kv1, length=(base_pos - pb).astype(jnp.int32))
            kv_idx = jnp.arange(kv_max)[None, :]
            kv_valid = kv_idx >= (base_pos - pb + pad_start)
            rc = jax.lax.dynamic_slice(params["rope_cos"],
                                       (base_pos - pb, 0), (pb, t.head_dim))
            rs = jax.lax.dynamic_slice(params["rope_sin"],
                                       (base_pos - pb, 0), (pb, t.head_dim))
            hid_all, kv1 = qwen3_stack_step(
                params["talker"], buf, kv1, t, rc, rs, kv_valid=kv_valid,
                return_all=True)
            return kv1, hid_all[:, -1]

        self._prefill_fn = jax.jit(prefill_fn)

        def insert_fn(kv, hid, trailing, kv1, hid1, tr1, slot):
            k = jax.lax.dynamic_update_slice(kv.k, kv1.k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(kv.v, kv1.v, (0, slot, 0, 0, 0))
            kv = dc.replace(kv, k=k, v=v,
                            length=jnp.maximum(kv.length, kv1.length))
            hid = jax.lax.dynamic_update_slice(hid, hid1, (slot, 0))
            trailing = jax.lax.dynamic_update_slice(
                trailing, tr1.astype(trailing.dtype), (slot, 0, 0))
            return kv, hid, trailing

        self._insert_fn = jax.jit(insert_fn, donate_argnums=(0, 1, 2))

    def _vocode_fn(self, fb: int):
        if fb not in self._voc_cache:
            from ..models.qwen_codec import codec_decode

            ccfg = self.ccfg

            @jax.jit
            def run(codec_params, frames_row, n):
                codes = frames_row[None, :fb] * (jnp.arange(fb)
                                                 < n)[None, :, None]
                wav = codec_decode(codec_params, codes, ccfg)
                return (wav * 32767.0).astype(jnp.int16)

            self._voc_cache[fb] = run
        return self._voc_cache[fb]

    # ------------------------------------------------------------- client

    def submit(self, prefill: np.ndarray, trailing: np.ndarray,
               max_frames: int | None = None,
               deadline_s: float | None = None):
        return self._submit(*self._validate(prefill, trailing, max_frames),
                            deadline_s=deadline_s)

    def submit_stream(self, prefill: np.ndarray, trailing: np.ndarray,
                      max_frames: int | None = None, window: int = 72,
                      left_context: int = 24) -> StreamHandle:
        """Streaming variant: returns a StreamHandle iterating int16
        audio chunks as the row's chunk boundaries produce them —
        CONCURRENT streams share the slot batch instead of each holding a
        solo decode loop (the /stream bypass). Window/overlap semantics
        match synthesize_streaming (the reference's chunked_decode,
        Export_Qwen_TTS_ONNX.py:2706-2726): each codec window carries
        `left_context` frames of already-emitted codes whose audio is
        discarded."""
        cms = getattr(self.ccfg, "max_seq_len", None)
        if cms is not None and window > cms:
            raise ValueError(
                f"window {window} > codec max_seq_len {cms}")
        (prefill, trailing), cap = self._validate(prefill, trailing,
                                                  max_frames)
        handle = StreamHandle()
        fut = self._submit((prefill, trailing,
                            (handle, window, left_context)), cap)
        # a worker-side failure (or close() cancellation) must unblock the
        # consumer, not just the future
        fut.add_done_callback(
            lambda f: handle._fail(f.exception() or RuntimeError(
                "request cancelled"))
            if (f.cancelled() or f.exception()) else None)
        return handle

    def _validate(self, prefill, trailing, max_frames):
        if prefill.shape[1] > self.bucket:
            raise ValueError(
                f"prefill {prefill.shape[1]} > bucket {self.bucket}")
        if trailing.shape[1] > self.tb:
            raise ValueError(
                f"trailing {trailing.shape[1]} > bucket {self.tb}")
        cap = min(max_frames or self.fbuf, self.fbuf)
        return (np.asarray(prefill, np.float32),
                np.asarray(trailing, np.float32)), cap

    # ------------------------------------------------------ engine hooks

    def _fresh(self):
        bsz = self._slots
        t = self.cfg.talker
        dt = jnp.result_type(self.pipe.params["talker_codec_embed"].dtype)
        return {
            "kv": KVCache.create(t.num_layers, bsz, t.num_kv_heads,
                                 self.kv_max, t.head_dim, dt),
            "hid": jnp.zeros((bsz, t.hidden_size), dt),
            "frames": jnp.zeros((bsz, self.fbuf, self.cfg.num_code_groups),
                                jnp.int32),
            "save0": jnp.zeros((bsz, self.fbuf), jnp.int32),
            "cnt": jnp.zeros((bsz,), jnp.int32),
            "fin": jnp.ones((bsz,), bool),
            "done": jnp.zeros((bsz,), jnp.int32),
            "trailing": jnp.zeros((bsz, self.tb, t.hidden_size), dt),
            "kvf": np.zeros((bsz,), np.int32),
            "cap": np.zeros((bsz,), np.int32),
            "stream": [None] * bsz,   # {handle, codec, prev} per slot
        }

    def _fin_done(self, s):
        return jax.device_get((s["fin"], s["done"]))

    def _window_fn(self, window: int):
        """Jitted codec decode at a fixed window for streaming assembly."""
        key = ("win", window)
        if key not in self._voc_cache:
            from ..models.qwen_codec import codec_decode

            ccfg = self.ccfg

            @jax.jit
            def run(codec_params, codes):
                wav = codec_decode(codec_params, codes, ccfg)
                return (wav * 32767.0).astype(jnp.int16)

            self._voc_cache[key] = run
        return self._voc_cache[key]

    def _post_chunk(self, s) -> None:
        if not any(st is not None for st in s["stream"]):
            return
        # ONE fetch for the whole frame buffer (B x fbuf x G int32, tens
        # of KB) — per-row sliced fetches each pay a full transport round
        # trip (~tens of ms over a remote-chip tunnel)
        cnt = np.asarray(s["cnt"])
        frames_h = np.asarray(s["frames"])
        for b, st in enumerate(s["stream"]):
            if st is None:
                continue
            new = int(cnt[b])
            if new > st["prev"]:
                frames = frames_h[b, st["prev"]:new]
                st["prev"] = new
                out = st["codec"].push_frames(frames)
                if out is not None and len(out):
                    st["handle"]._put(out)

    def _finalize(self, s, b: int, n: int):
        st = s["stream"][b]
        if st is not None:
            s["stream"][b] = None
            # flush frames produced in the final chunk, then the tail
            if n > st["prev"]:
                out = st["codec"].push_frames(
                    np.asarray(s["frames"][b, st["prev"]:n]))
                if out is not None and len(out):
                    st["handle"]._put(out)
            for out in st["codec"].finish():
                if len(out):
                    st["handle"]._put(out)
            st["handle"]._close(n)
            return None, n
        if n <= 0:
            return np.zeros(0, np.int16), 0
        fb = min(max(8, -(-n // 8) * 8), self.fbuf)
        wav = np.asarray(self._vocode_fn(fb)(
            self.pipe.codec_params, s["frames"][b], np.int32(n)))
        return wav[0, : n * self.ccfg.total_upsample], n

    def _admit_row(self, s, b: int, payload, cap: int) -> None:
        prefill, trailing = payload[0], payload[1]
        if len(payload) == 3:
            from ..runtime.streaming import ChunkedCodecStream

            handle, window, left_context = payload[2]
            s["stream"][b] = {
                "handle": handle, "prev": 0,
                "codec": ChunkedCodecStream(
                    lambda codes: self._window_fn(codes.shape[1])(
                        self.pipe.codec_params,
                        jnp.asarray(codes.astype(np.int32))),
                    window=window, left_context=left_context,
                    upsample=self.ccfg.total_upsample,
                    num_groups=self.cfg.num_code_groups),
            }
        else:
            s["stream"][b] = None
        p = prefill.shape[1]
        buf = np.zeros((1, self.bucket, prefill.shape[2]), np.float32)
        buf[0, self.bucket - p:] = prefill[0]
        tr = np.zeros((1, self.tb, trailing.shape[2]), np.float32)
        tr[0, :trailing.shape[1]] = trailing[0]
        # repeat the last (tts_pad) embedding so gathers past the true
        # length return the pad embedding (runtime/qwen.py:693-698)
        tr[0, trailing.shape[1]:] = trailing[0, -1:]
        kv1, hid1 = self._prefill_fn(
            self.pipe.params, jnp.asarray(buf),
            np.int32(self.bucket - p), np.int32(s["pos"]))
        s["kv"], s["hid"], s["trailing"] = self._insert_fn(
            s["kv"], s["hid"], s["trailing"], kv1, hid1,
            jnp.asarray(tr), np.int32(b))
        s["frames"] = s["frames"].at[b].set(0)
        s["save0"] = s["save0"].at[b].set(0)
        s["cnt"] = s["cnt"].at[b].set(0)
        s["fin"] = s["fin"].at[b].set(False)
        s["done"] = s["done"].at[b].set(cap)
        s["kvf"][b] = s["pos"] - p
        s["cap"][b] = cap

    def _step_chunk(self, s) -> None:
        (s["kv"], s["hid"], s["frames"], s["save0"], s["cnt"], s["fin"],
         s["done"]) = self._chunk_fn(
            self.pipe.params, s["kv"], s["hid"], s["frames"], s["save0"],
            s["cnt"], s["fin"], s["done"], s["trailing"],
            jnp.asarray(s["kvf"]), jnp.asarray(s["cap"]))
