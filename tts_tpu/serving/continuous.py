"""Slot-based continuous batching for the Kani AR decode.

The MicroBatcher (serving/batcher.py) groups requests at admission time:
a request arriving mid-decode waits for the whole batch's while_loop. At
production request rates that wait dominates p99. This server decodes a
FIXED batch of B slots in bounded CHUNKS (a jitted `chunk`-step fori
body), and between chunks it:

  1. extracts finished rows (vocoded on device) and resolves futures,
  2. admits queued requests into free slots — a one-row offset prefill
     writes the new prompt's KV at the batch's CURRENT shared position
     and a row-scatter splices it into the live state,

so a request admitted mid-decode starts on the next chunk boundary
(~chunk x step-time, not a whole batch generation) and finishes on its
own schedule.

TPU design notes:
- All rows share ONE kv position counter (the KVCache writes one
  dynamic_update_slice per layer on the carried buffer — the round-2
  lesson; per-row write positions would force scatters). New prompts are
  right-justified against the shared position and each row masks its own
  dead prefix via kani_step's `key_valid_from` — rope attention only
  sees relative offsets, so the shared shift is free (the same argument
  as the batched prefill layout, runtime/kani.py:227-232).
- The shared counter grows monotonically; a request is admitted only if
  its worst-case endpoint (pos + cap + chunk) fits max_seq_len. When no
  admission fits, the server DRAINS: live rows finish, then the state
  resets fresh. Utilization dips at the wrap point; p50/p99 still beat
  admission batching because wraps are rare. Size cfg.max_seq_len for
  several generations (>= 2-4x max_new_tokens) in production.
- Chunk size trades admission latency against dispatch overhead: each
  chunk is one device dispatch of `chunk` fused steps.

The reference has no serving at all (SURVEY.md §2.9) — this extends the
repo's beyond-reference serving layer.
"""
from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["KaniSlotServer", "SlotStats"]


@dataclass
class SlotStats:
    requests: int = 0
    completed: int = 0
    chunks: int = 0
    drains: int = 0
    admissions_mid_decode: int = 0
    latencies_s: list = field(default_factory=list)   # admit -> complete

    def snapshot(self) -> dict:
        lat = sorted(self.latencies_s)

        def pct(p):
            if not lat:
                return 0.0
            return round(lat[min(int(p * len(lat)), len(lat) - 1)] * 1e3, 1)

        return {"requests": self.requests, "completed": self.completed,
                "chunks": self.chunks, "drains": self.drains,
                "admissions_mid_decode": self.admissions_mid_decode,
                "p50_ms": pct(0.50), "p99_ms": pct(0.99)}


class KaniSlotServer:
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
        self.slots = slots
        self.chunk = chunk
        self.bucket = prompt_bucket
        dcfg = pipeline.dcfg
        cap, buf, fbuf = pipeline._buf_for(dcfg.max_new_tokens)
        self.cap, self.buf, self.fbuf = min(cap, buf), buf, fbuf
        if self.bucket + self.cap + self.chunk > self.cfg.max_seq_len:
            raise ValueError(
                f"max_seq_len {self.cfg.max_seq_len} too small for "
                f"bucket {self.bucket} + cap {self.cap} + chunk "
                f"{self.chunk}; lower max_new_tokens or raise max_seq_len")

        self._init_state = lambda b: init_state(
            self.cfg, batch=b, kv_dtype=pipeline.params["embed"].dtype)
        self._build_programs()

        self._q: queue.Queue = queue.Queue(maxsize=queue_limit)
        self._pending: collections.deque = collections.deque()
        self.stats = SlotStats()
        self._lock = threading.Lock()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="kani-slot-server")
        self._worker.start()

    # ----------------------------------------------------------- programs

    def _build_programs(self):
        from ..decoding.sampling import greedy
        from ..models.kani import KaniState, embed_tokens, kani_step

        cfg, dcfg = self.cfg, self.pipe.dcfg
        bsz, chunk, buf = self.slots, self.chunk, self.buf
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
               max_new_tokens: int | None = None) -> Future:
        if self._closed:
            raise RuntimeError("KaniSlotServer is closed")
        if ids.shape[1] > self.bucket:
            raise ValueError(f"prompt {ids.shape[1]} > bucket {self.bucket}")
        fut: Future = Future()
        cap = min(max_new_tokens or self.cap, self.cap)
        self._q.put((np.asarray(ids, np.int32), cap, fut,
                     time.perf_counter()), timeout=5.0)
        with self._lock:
            self.stats.requests += 1
        return fut

    def close(self, timeout: float = 60.0) -> None:
        self._closed = True
        self._worker.join(timeout=timeout)
        for item in self._pending:
            item[2].cancel()
        while True:
            try:
                self._q.get_nowait()[2].cancel()
            except queue.Empty:
                break

    # ------------------------------------------------------------- worker

    def _fresh(self):
        bsz, buf = self.slots, self.buf
        return {
            "state": self._init_state(bsz),
            "save": jnp.zeros((bsz, buf), jnp.int32),
            "cnt": jnp.zeros((bsz,), jnp.int32),
            "last": jnp.full((bsz,), self.cfg.stop_token, jnp.int32),
            "fin": jnp.ones((bsz,), bool),
            "done": jnp.zeros((bsz,), jnp.int32),
            "kvf": np.zeros((bsz,), np.int32),
            "cap": np.zeros((bsz,), np.int32),
            "pos": self.bucket,            # shared kv position counter
            "reqs": [None] * bsz,          # (future, t_admit) per slot
        }

    def _harvest(self, s) -> None:
        fin_host, done_host = jax.device_get((s["fin"], s["done"]))
        g = self.ccfg.num_groups
        for b in range(self.slots):
            if s["reqs"][b] is not None and fin_host[b]:
                fut, t_admit = s["reqs"][b]
                n = int(done_host[b])
                wav = np.asarray(self._vocode_fn(
                    self.pipe.codec_params, s["save"][b:b + 1],
                    np.int32(n)))
                frames = max((n - 2) // g, 0)
                fut.set_result(
                    (wav[0, : frames * self.ccfg.total_upsample], n))
                s["reqs"][b] = None
                with self._lock:
                    self.stats.completed += 1
                    self.stats.latencies_s.append(
                        time.perf_counter() - t_admit)

    def _admit(self, s) -> None:
        while True:
            try:
                self._pending.append(self._q.get_nowait())
            except queue.Empty:
                break
        live_any = any(r is not None for r in s["reqs"])
        # drain complete: nothing live and the next admission won't fit
        if (self._pending and not live_any
                and s["pos"] + self._pending[0][1] + self.chunk
                > self.cfg.max_seq_len):
            with self._lock:
                self.stats.drains += 1
            s.update(self._fresh())
        while self._pending:
            free = next((b for b in range(self.slots)
                         if s["reqs"][b] is None), None)
            if free is None:
                break
            ids, cap, fut, t_admit = self._pending[0]
            if s["pos"] + cap + self.chunk > self.cfg.max_seq_len:
                break                      # no headroom: drain in progress
            self._pending.popleft()
            mid_decode = any(r is not None for r in s["reqs"])
            ids_buf = np.zeros((1, self.bucket), np.int32)
            p = ids.shape[1]
            ids_buf[0, self.bucket - p:] = ids[0]
            state1, first = self._prefill_fn(
                self.pipe.params, jnp.asarray(ids_buf),
                np.int32(self.bucket - p), np.int32(s["pos"]))
            b = free
            s["state"] = self._insert_fn(s["state"], state1, np.int32(b))
            s["save"] = s["save"].at[b].set(0).at[b, 0].set(first)
            s["cnt"] = s["cnt"].at[b].set(1)
            s["last"] = s["last"].at[b].set(first)
            s["fin"] = s["fin"].at[b].set(first == self.cfg.stop_token)
            s["done"] = s["done"].at[b].set(0)
            s["kvf"][b] = s["pos"] - p
            s["cap"][b] = cap
            s["reqs"][b] = (fut, t_admit)
            if mid_decode:
                with self._lock:
                    self.stats.admissions_mid_decode += 1

    def _run(self):
        s = self._fresh()
        while not self._closed:
            self._harvest(s)
            self._admit(s)
            if not any(r is not None for r in s["reqs"]):
                time.sleep(0.001)
                continue
            (s["state"], s["save"], s["cnt"], s["last"], s["fin"],
             s["done"]) = self._chunk_fn(
                self.pipe.params, s["state"], s["save"], s["cnt"],
                s["last"], s["fin"], s["done"],
                jnp.asarray(s["kvf"]), jnp.asarray(s["cap"]))
            s["pos"] += self.chunk
            with self._lock:
                self.stats.chunks += 1
