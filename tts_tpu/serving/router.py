"""Least-loaded routing across per-device slot servers, with failover.

Multi-chip continuous serving, the TPU way: each chip owns ONE slot
server (its params placed on that device with `jax.device_put`; jitted
programs follow their arguments' placement), and a host-side router
picks the least-loaded server per request. Chips never communicate —
TTS requests are independent, so scaling serving across a pod slice is
pure data parallelism with no collectives, unlike the in-batch dp mode
(`pipeline(mesh=...)`) which shards ONE batch over chips and pays an
all-reduced stop predicate per step.

Dispatch from concurrent worker threads to different devices overlaps:
each slot server's worker thread enqueues work on its own device
queue, so N chips decode N slot batches concurrently.

Failover: the router installs itself as each engine's `on_failure`
hook. When a server's worker crashes, its unfinished requests —
live slots, admission backlog, and queue — are re-routed to surviving
servers with their ORIGINAL futures, so clients never see the crash
(decode is deterministic, so a from-scratch replay is byte-identical).
Two exceptions fail instead of replaying: streaming requests that
already delivered audio (replay would duplicate chunks), and any
request when no healthy server remains. A dead server is excluded
from routing; submits keep working while >= 1 server is healthy.

The reference is single-stream single-device (SURVEY.md §2.9); this is
beyond-reference capability built on serving/slots.
"""
from __future__ import annotations

import threading

from .slots import SlotEngine, StreamHandle, _set_exception

__all__ = ["SlotRouter"]


class SlotRouter:
    """Route submits to the least-loaded of several slot servers.

    servers: adapters of the same family (e.g. one KaniSlotServer per
    device). Exposes submit/stats/close mirroring a single server.
    """

    def __init__(self, servers: list[SlotEngine]):
        if not servers:
            raise ValueError("need at least one server")
        self.servers = list(servers)
        self._lock = threading.Lock()
        self._dead: list[SlotEngine] = []
        self._failovers = 0
        self._failover_requests = 0
        for srv in self.servers:
            srv.on_failure = self._failover

    @classmethod
    def for_devices(cls, make_server, devices) -> "SlotRouter":
        """make_server(device) -> slot server whose pipeline params live
        on `device`. Typical factory:

            def make_server(d):
                p = jax.device_put(params, d)
                cp = jax.device_put(codec_params, d)
                pipe = KaniPipeline(p, cfg, cp, ccfg, dcfg)
                return KaniSlotServer(pipe, slots=4)
        """
        return cls([make_server(d) for d in devices])

    # ---------------------------------------------------------- routing

    def _healthy(self) -> list[SlotEngine]:
        return [s for s in self.servers if s.healthy]

    def _pick(self) -> SlotEngine:
        healthy = self._healthy()
        if not healthy:
            raise RuntimeError("no healthy slot server remains")
        return min(healthy, key=lambda s: s.in_flight)

    def submit(self, *args, **kwargs):
        return self._pick().submit(*args, **kwargs)

    def submit_stream(self, *args, **kwargs):
        return self._pick().submit_stream(*args, **kwargs)

    # --------------------------------------------------------- failover

    def _failover(self, server: SlotEngine, exc: BaseException,
                  items: list) -> None:
        """Engine on_failure hook (runs on the dying worker thread):
        re-route every unfinished request to surviving servers."""
        with self._lock:
            if server not in self._dead:
                self._dead.append(server)
            self._failovers += 1
        for req in items:
            handle = self._stream_handle_of(req.payload)
            if handle is not None and handle.emitted:
                # audio already left the building: a replay would emit
                # duplicate chunks — fail loudly instead
                _set_exception(req.fut, RuntimeError(
                    "server failed mid-stream after audio was delivered; "
                    "cannot replay without duplication") )
                continue
            try:
                target = self._pick()
            except RuntimeError:
                _set_exception(req.fut, exc)
                continue
            try:
                target._enqueue(req)       # original future travels along
                with self._lock:
                    self._failover_requests += 1
            except Exception:
                _set_exception(req.fut, exc)

    @staticmethod
    def _stream_handle_of(payload) -> StreamHandle | None:
        if isinstance(payload, tuple):
            for part in payload:
                if isinstance(part, StreamHandle):
                    return part
                if isinstance(part, tuple):
                    for sub in part:
                        if isinstance(sub, StreamHandle):
                            return sub
        return None

    # ------------------------------------------------------------ stats

    @property
    def in_flight(self) -> int:
        return sum(s.in_flight for s in self.servers)

    def stats(self) -> dict:
        per = [s.stats.snapshot() for s in self.servers]
        agg = {
            "servers": len(per),
            "healthy_servers": len(self._healthy()),
            "failovers": self._failovers,
            "failover_requests": self._failover_requests,
            "requests": sum(p["requests"] for p in per),
            "completed": sum(p["completed"] for p in per),
            "admissions_mid_decode": sum(p["admissions_mid_decode"]
                                         for p in per),
            "per_server": per,
        }
        return agg

    def close(self, timeout: float = 60.0) -> None:
        for s in self.servers:
            s.close(timeout=timeout)
