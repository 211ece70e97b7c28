"""Generic slot-based continuous-batching engine.

Family-agnostic scaffolding for continuous batching over an AR decode:
a FIXED batch of B slots decodes in bounded CHUNKS (one jitted dispatch
of `chunk` fused steps); between chunks the engine

  1. harvests finished rows (subclass finalizes them on device) and
     resolves their futures,
  2. admits queued requests into free slots (subclass runs a one-row
     offset prefill and splices it into the live batch state),

so a request admitted mid-decode starts on the next chunk boundary and
finishes on its own schedule instead of waiting for the whole batch's
while_loop (the MicroBatcher admission-time trade, serving/batcher.py).

Shared-position invariant (the TPU design that makes splicing cheap):
all rows share ONE kv position counter — the KV append stays a single
dynamic_update_slice on the loop carry (the round-2 KV lesson) — and
each row masks its dead prefix via a per-row first-valid-key index.
That is sound for every family here because their decode attention is
either rope-relative (Kani, Qwen — absolute shift cancels) or
position-free (IndexTTS GPT-2 — positions come from external learned
tables added to the inputs, models/indextts.py:292-301). The shared
counter grows monotonically; when the next admission cannot fit before
`seq_limit` the engine DRAINS (live rows finish, state resets fresh).

Subclasses implement the family-specific device programs:
  _fresh()                 -> state dict (device buffers + host arrays)
  _fin_done(s)             -> (fin, done) host arrays, shape (slots,)
  _finalize(s, slot, n)    -> result for the resolved future
  _admit_row(s, slot, payload, cap) -> bool admitted (prefill + splice)
  _step_chunk(s)           -> run one chunk program over the state

The reference has no serving layer at all (SURVEY.md §2.9) — this whole
subsystem is beyond-reference.
"""
from __future__ import annotations

import collections
import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field

__all__ = ["SlotEngine", "SlotStats", "StreamHandle"]


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


class StreamHandle:
    """Blocking iterator over a streaming request's audio chunks.

    The serving worker pushes int16 chunks as chunk boundaries produce
    them; iteration ends when the request completes (or errors — the
    exception re-raises in the consumer)."""

    _DONE = object()

    def __init__(self):
        self._q: queue.Queue = queue.Queue()
        self.n_frames: int | None = None      # set when the stream ends

    def _put(self, chunk) -> None:
        self._q.put(chunk)

    def _close(self, n_frames: int) -> None:
        self.n_frames = n_frames
        self._q.put(self._DONE)

    def _fail(self, exc: BaseException) -> None:
        self._q.put(exc)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item


class SlotEngine:
    """Base continuous-batching worker. Subclass __init__ must set up its
    jitted programs, then call super().__init__ (which starts the worker
    thread immediately)."""

    def __init__(self, *, slots: int, chunk: int, seq_limit: int,
                 start_pos: int, queue_limit: int = 256,
                 name: str = "slot-server"):
        self.slots = slots
        self.chunk = chunk
        self.seq_limit = seq_limit
        self.start_pos = start_pos
        self._q: queue.Queue = queue.Queue(maxsize=queue_limit)
        self._pending: collections.deque = collections.deque()
        self.stats = SlotStats()
        self._lock = threading.Lock()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name=name)
        self._worker.start()

    # ------------------------------------------------ subclass interface

    def _fresh(self) -> dict:
        raise NotImplementedError

    def _fin_done(self, s):
        raise NotImplementedError

    def _finalize(self, s, slot: int, n: int):
        raise NotImplementedError

    def _admit_row(self, s, slot: int, payload, cap: int) -> None:
        raise NotImplementedError

    def _step_chunk(self, s) -> None:
        raise NotImplementedError

    def _post_chunk(self, s) -> None:
        """Optional hook after each chunk (before the next harvest):
        adapters emit partial results for streaming requests here."""

    # ------------------------------------------------------------- client

    @property
    def in_flight(self) -> int:
        """Requests submitted but not yet completed (queue + live slots)."""
        with self._lock:
            return self.stats.requests - self.stats.completed

    def _submit(self, payload, cap: int) -> Future:
        if self._closed:
            raise RuntimeError(f"{type(self).__name__} is closed")
        fut: Future = Future()
        self._q.put((payload, cap, fut, time.perf_counter()), timeout=5.0)
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

    def _fresh_base(self) -> dict:
        s = self._fresh()
        s["pos"] = self.start_pos      # shared kv position counter
        s["reqs"] = [None] * self.slots   # (future, t_admit) per slot
        return s

    def _harvest(self, s) -> None:
        if not any(r is not None for r in s["reqs"]):
            return
        fin, done = self._fin_done(s)
        for b in range(self.slots):
            if s["reqs"][b] is not None and fin[b]:
                fut, t_admit = s["reqs"][b]
                try:
                    result = self._finalize(s, b, int(done[b]))
                except Exception as e:
                    # finalize touches only this row — fail this request,
                    # keep the batch serving
                    fut.set_exception(e)
                else:
                    fut.set_result(result)
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
                > self.seq_limit):
            with self._lock:
                self.stats.drains += 1
            s.update(self._fresh_base())
        while self._pending:
            free = next((b for b in range(self.slots)
                         if s["reqs"][b] is None), None)
            if free is None:
                break
            payload, cap, fut, t_admit = self._pending[0]
            if s["pos"] + cap + self.chunk > self.seq_limit:
                break                  # no headroom: drain in progress
            self._pending.popleft()
            mid_decode = any(r is not None for r in s["reqs"])
            self._admit_row(s, free, payload, cap)
            s["reqs"][free] = (fut, t_admit)
            if mid_decode:
                with self._lock:
                    self.stats.admissions_mid_decode += 1

    def _run(self):
        s = self._fresh_base()
        try:
            while not self._closed:
                self._harvest(s)
                self._admit(s)
                if not any(r is not None for r in s["reqs"]):
                    time.sleep(0.001)
                    continue
                self._step_chunk(s)
                s["pos"] += self.chunk
                self._post_chunk(s)
                with self._lock:
                    self.stats.chunks += 1
        except BaseException as e:
            # a worker failure must FAIL every waiter, not strand them:
            # live slots, the admission backlog, and anything still queued
            # all see the exception through their futures (stream handles
            # re-raise it via their done-callback)
            self._closed = True
            for r in s["reqs"]:
                if r is not None:
                    r[0].set_exception(e)
            while self._pending:
                self._pending.popleft()[2].set_exception(e)
            while True:
                try:
                    self._q.get_nowait()[2].set_exception(e)
                except queue.Empty:
                    break
            raise
        for r in s["reqs"]:          # closed mid-decode: unblock waiters
            if r is not None:
                r[0].cancel()
