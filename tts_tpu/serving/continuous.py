"""Slot-based continuous batching for the Kani AR decode.

Family adapter over serving/slots.SlotEngine (the generic continuous-
batching worker — see that module for the chunked-decode / mid-decode
admission / drain design and the shared-kv-position argument). Kani
specifics here:

- One jitted `chunk`-step fori body runs embed -> kani_step (GQA +
  LFM2 conv carry) -> per-row repetition penalty -> greedy, with dead
  rows embedding zeros.
- Admission prefills ONE row at the batch's current shared position
  (rope sees only relative offsets, so the right-justified offset
  prefill is byte-equal to a solo decode — tests/test_continuous.py)
  and splices its KV/conv state into the live batch.
- Finished rows vocode on device through the causal NanoCodec from the
  row's saved token buffer.

Slot KV sizing: production configs need max_seq_len >= bucket + cap +
chunk with headroom for several generations between drains; the 370m
config serves with max_seq_len=4096. Measured on-chip (370m int8,
256-token generations, 4 rps x 32 requests, slots=4/chunk=32):
continuous p50 6.50 s / p99 10.21 s vs admission batching 57.58 /
59.38 s (benchmarks/serving_bench.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .slots import SlotEngine, SlotStats, StreamHandle

__all__ = ["KaniSlotServer", "SlotStats"]


class KaniSlotServer(SlotEngine):
    """Continuous-batching server over a KaniPipeline.

    submit(ids) -> Future resolving to (int16 wav, n_tokens).
    ids: (1, P) int32 full prompt (head/tail attached, pipeline.tokenize).
    """

    def __init__(self, pipeline, *, slots: int = 4, chunk: int = 32,
                 prompt_bucket: int = 64, queue_limit: int = 256):
        from ..models.kani import init_state

        self.pipe = pipeline
        self.cfg = pipeline.cfg
        self.ccfg = pipeline.codec_cfg
        self.bucket = prompt_bucket
        dcfg = pipeline.dcfg
        cap, buf, fbuf = pipeline._buf_for(dcfg.max_new_tokens)
        self.cap, self.buf, self.fbuf = min(cap, buf), buf, fbuf
        if self.bucket + self.cap + chunk > self.cfg.max_seq_len:
            raise ValueError(
                f"max_seq_len {self.cfg.max_seq_len} too small for "
                f"bucket {self.bucket} + cap {self.cap} + chunk "
                f"{chunk}; lower max_new_tokens or raise max_seq_len")

        self._init_state = lambda b: init_state(
            self.cfg, batch=b, kv_dtype=pipeline.params["embed"].dtype)
        self._slots = slots
        self._build_programs(slots, chunk)
        super().__init__(slots=slots, chunk=chunk,
                         seq_limit=self.cfg.max_seq_len,
                         start_pos=self.bucket, queue_limit=queue_limit,
                         name="kani-slot-server")

    # ----------------------------------------------------------- programs

    def _build_programs(self, bsz: int, chunk: int):
        from ..decoding.sampling import greedy
        from ..models.kani import KaniState, embed_tokens, kani_step

        cfg, dcfg = self.cfg, self.pipe.dcfg
        buf = self.buf
        penalty, prange = dcfg.repeat_penalty, dcfg.penalty_range
        use_penalty = penalty != 1.0

        def row_penalty(logits, save, cnt):
            """Per-row repetition penalty: each row's window ends at its
            OWN cursor (rows start at different shared steps, so the
            scalar-num helper in decoding/sampling.py does not apply);
            like the reference it engages only once the window is full
            (Kani_TTS/Inference_Kani_TTS_ONNX.py:335-338)."""
            r = min(prange, buf)
            offs = jnp.arange(r)[None, :]                    # (1, R)
            start = jnp.maximum(cnt - r, 0)[:, None]         # (B, 1)
            idx = jnp.minimum(start + offs, buf - 1)         # (B, R)
            rows = jnp.arange(logits.shape[0])[:, None]
            window = save[rows, idx]
            live = (cnt >= r)[:, None]                       # window full?
            vals = jnp.where(live, logits[rows, window] * penalty,
                             logits[rows, window])
            return logits.at[rows, window].set(vals)

        def chunk_fn(params, state, save, cnt, last, fin, done,
                     key_valid_from, cap_vec):
            def body(_, c):
                state, save, cnt, last, fin, done = c
                h = embed_tokens(params, last[:, None])
                h = h * (~fin)[:, None, None]        # dead rows embed zeros
                logits, state = kani_step(params, h, state, cfg,
                                          key_valid_from=key_valid_from,
                                          fused=self.pipe._fused)
                if use_penalty:
                    logits = row_penalty(logits, save, cnt)
                tok = greedy(logits)
                tok = jnp.where(fin, cfg.stop_token, tok)
                rows = jnp.arange(bsz)
                slot_idx = jnp.minimum(cnt, buf - 1)
                save = save.at[rows, slot_idx].set(
                    jnp.where(fin, save[rows, slot_idx], tok))
                is_stop = tok == cfg.stop_token
                hit_cap = cnt + 1 >= cap_vec
                newly = (is_stop | hit_cap) & (~fin)
                done = jnp.where(newly, jnp.where(is_stop, cnt, cnt + 1),
                                 done)
                cnt = jnp.where(fin | newly, cnt, cnt + 1)
                return state, save, cnt, tok, fin | newly, done

            return jax.lax.fori_loop(
                0, chunk, body, (state, save, cnt, last, fin, done))

        self._chunk_fn = jax.jit(chunk_fn, donate_argnums=(1, 2, 3, 4, 5, 6))

        def prefill_fn(params, ids_buf, pad_start, base_pos):
            """One-row offset prefill: fresh state advanced to
            base_pos - bucket, prompt right-justified in [base_pos-bucket,
            base_pos); rope positions continue the shared counter, so the
            spliced row is indistinguishable from one that prefilled at
            batch start (relative offsets identical)."""
            import dataclasses as dc

            state1 = self._init_state(1)
            kv = dc.replace(
                state1.kv,
                length=(base_pos - ids_buf.shape[1]).astype(jnp.int32))
            state1 = KaniState(kv, state1.conv)
            valid = jnp.arange(ids_buf.shape[1])[None, :] >= pad_start
            emb = embed_tokens(params, ids_buf) * valid[..., None]
            logits, state1 = kani_step(
                params, emb, state1, cfg,
                key_valid_from=(base_pos - ids_buf.shape[1]
                                + pad_start).reshape(1))
            return state1, greedy(logits)[0]

        self._prefill_fn = jax.jit(prefill_fn)

        def insert_fn(state, state1, slot):
            """Splice a one-row state into batch row `slot` (chunk
            boundary only — copies the row's full KV/conv buffers)."""
            import dataclasses as dc

            k = jax.lax.dynamic_update_slice(
                state.kv.k, state1.kv.k, (0, slot, 0, 0, 0))
            v = jax.lax.dynamic_update_slice(
                state.kv.v, state1.kv.v, (0, slot, 0, 0, 0))
            conv = jax.lax.dynamic_update_slice(
                state.conv, state1.conv, (0, slot, 0, 0))
            kv = dc.replace(state.kv, k=k, v=v,
                            length=jnp.maximum(state.kv.length,
                                               state1.kv.length))
            return KaniState(kv, conv)

        self._insert_fn = jax.jit(insert_fn, donate_argnums=(0,))

        def vocode_fn(codec_params, save_row, n):
            return self.pipe._vocode_in_graph(save_row, n, codec_params,
                                              self.fbuf)

        self._vocode_fn = jax.jit(vocode_fn)

    # ------------------------------------------------------------- client

    def submit(self, ids: np.ndarray,
               max_new_tokens: int | None = None,
               deadline_s: float | None = None):
        if ids.shape[1] > self.bucket:
            raise ValueError(f"prompt {ids.shape[1]} > bucket {self.bucket}")
        cap = min(max_new_tokens or self.cap, self.cap)
        return self._submit(np.asarray(ids, np.int32), cap,
                            deadline_s=deadline_s)

    def submit_stream(self, ids: np.ndarray,
                      max_new_tokens: int | None = None,
                      window: int = 48,
                      left_context: int | None = None) -> StreamHandle:
        """Streaming variant: a StreamHandle iterating int16 chunks as
        chunk boundaries produce codec frames — concurrent streams share
        the slot batch. EXACT streaming: the NanoCodec HiFiGAN is causal,
        so windowed decode with left_context >= its receptive field
        reproduces the full decode byte-for-byte; left_context=None
        measures the receptive field once by impulse probe
        (_receptive_frames) and uses it."""
        if ids.shape[1] > self.bucket:
            raise ValueError(f"prompt {ids.shape[1]} > bucket {self.bucket}")
        cap = min(max_new_tokens or self.cap, self.cap)
        if left_context is None:
            left_context = self._receptive_frames()
        if left_context >= window:
            raise ValueError(f"left_context {left_context} >= window "
                             f"{window}; raise window")
        handle = StreamHandle()
        fut = self._submit((np.asarray(ids, np.int32),
                            (handle, window, left_context)), cap)
        fut.add_done_callback(
            lambda f: handle._fail(f.exception() or RuntimeError(
                "request cancelled"))
            if (f.cancelled() or f.exception()) else None)
        return handle

    def _receptive_frames(self) -> int:
        """Causal-HiFiGAN receptive field in codec frames, measured: how
        many past frames can influence the current output sample. One
        probe decode at server startup, cached."""
        if getattr(self, "_rf_frames", None) is None:
            from ..models.nanocodec import fsq_dequantize, hifigan_decode

            ccfg = self.ccfg
            n = 64
            base = np.zeros((1, n, ccfg.num_groups), np.int32)
            probe = base.copy()
            probe[0, 0] = 1
            f = jax.jit(lambda p, c: hifigan_decode(
                p, fsq_dequantize(jnp.asarray(c), ccfg), ccfg))
            d = np.abs(np.asarray(f(self.pipe.codec_params, probe))
                       - np.asarray(f(self.pipe.codec_params, base)))[0]
            nz = np.nonzero(d > 1e-7)[0]
            last = int(nz[-1]) if len(nz) else 0
            self._rf_frames = min(last // ccfg.total_upsample + 1, n)
        return self._rf_frames

    # ------------------------------------------------------ engine hooks

    def _fresh(self):
        bsz, buf = self._slots, self.buf
        return {
            "state": self._init_state(bsz),
            "save": jnp.zeros((bsz, buf), jnp.int32),
            "cnt": jnp.zeros((bsz,), jnp.int32),
            "last": jnp.full((bsz,), self.cfg.stop_token, jnp.int32),
            "fin": jnp.ones((bsz,), bool),
            "done": jnp.zeros((bsz,), jnp.int32),
            "kvf": np.zeros((bsz,), np.int32),
            "cap": np.zeros((bsz,), np.int32),
            "stream": [None] * bsz,   # {handle, codec, prev} per slot
        }

    def _fin_done(self, s):
        return jax.device_get((s["fin"], s["done"]))

    def _window_fn(self, window: int):
        """Jitted codec decode of a raw-token window for streaming."""
        key = ("win", window)
        if not hasattr(self, "_win_cache"):
            self._win_cache = {}
        if key not in self._win_cache:
            from ..models.nanocodec import (fsq_dequantize, hifigan_decode,
                                            tokens_to_codes)

            ccfg = self.ccfg

            @jax.jit
            def run(codec_params, tokens):
                flat = tokens.reshape(1, -1)
                codes = tokens_to_codes(flat, ccfg,
                                        self.pipe.audio_tokens_start)
                wav = hifigan_decode(codec_params,
                                     fsq_dequantize(codes, ccfg), ccfg)
                return (jnp.clip(wav, -1.0, 1.0)
                        * 32767.0).astype(jnp.int16)

            self._win_cache[key] = run
        return self._win_cache[key]

    def _frames_of(self, n_tokens: int) -> int:
        return max((n_tokens - 2) // self.ccfg.num_groups, 0)

    def _post_chunk(self, s) -> None:
        if not any(st is not None for st in s["stream"]):
            return
        cnt = np.asarray(s["cnt"])
        save_h = np.asarray(s["save"])      # one fetch for all rows
        g = self.ccfg.num_groups
        for b, st in enumerate(s["stream"]):
            if st is None:
                continue
            new = self._frames_of(int(cnt[b]))
            if new > st["prev"]:
                toks = save_h[b, 2 + st["prev"] * g: 2 + new * g]
                st["prev"] = new
                out = st["codec"].push_frames(toks.reshape(-1, g))
                if out is not None and len(out):
                    st["handle"]._put(out)

    def _finalize(self, s, b: int, n: int):
        st = s["stream"][b]
        if st is not None:
            s["stream"][b] = None
            g = self.ccfg.num_groups
            total = self._frames_of(n)
            if total > st["prev"]:
                toks = np.asarray(
                    s["save"][b, 2 + st["prev"] * g: 2 + total * g])
                out = st["codec"].push_frames(toks.reshape(-1, g))
                if out is not None and len(out):
                    st["handle"]._put(out)
            for out in st["codec"].finish():
                if len(out):
                    st["handle"]._put(out)
            st["handle"]._close(n)
            return None, n
        g = self.ccfg.num_groups
        wav = np.asarray(self._vocode_fn(
            self.pipe.codec_params, s["save"][b:b + 1], np.int32(n)))
        frames = max((n - 2) // g, 0)
        return wav[0, : frames * self.ccfg.total_upsample], n

    def _admit_row(self, s, b: int, payload, cap: int) -> None:
        if isinstance(payload, tuple):
            from ..runtime.streaming import ChunkedCodecStream

            ids, (handle, window, left_context) = payload
            s["stream"][b] = {
                "handle": handle, "prev": 0,
                "codec": ChunkedCodecStream(
                    lambda codes: self._window_fn(codes.shape[1])(
                        self.pipe.codec_params,
                        jnp.asarray(codes.astype(np.int32))),
                    window=window, left_context=left_context,
                    upsample=self.ccfg.total_upsample,
                    num_groups=self.ccfg.num_groups),
            }
        else:
            ids = payload
            s["stream"][b] = None
        ids_buf = np.zeros((1, self.bucket), np.int32)
        p = ids.shape[1]
        ids_buf[0, self.bucket - p:] = ids[0]
        state1, first = self._prefill_fn(
            self.pipe.params, jnp.asarray(ids_buf),
            np.int32(self.bucket - p), np.int32(s["pos"]))
        s["state"] = self._insert_fn(s["state"], state1, np.int32(b))
        s["save"] = s["save"].at[b].set(0).at[b, 0].set(first)
        s["cnt"] = s["cnt"].at[b].set(1)
        s["last"] = s["last"].at[b].set(first)
        s["fin"] = s["fin"].at[b].set(first == self.cfg.stop_token)
        s["done"] = s["done"].at[b].set(0)
        s["kvf"][b] = s["pos"] - p
        s["cap"][b] = cap

    def _step_chunk(self, s) -> None:
        (s["state"], s["save"], s["cnt"], s["last"], s["fin"],
         s["done"]) = self._chunk_fn(
            self.pipe.params, s["state"], s["save"], s["cnt"],
            s["last"], s["fin"], s["done"],
            jnp.asarray(s["kvf"]), jnp.asarray(s["cap"]))
