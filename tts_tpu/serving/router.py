"""Least-loaded routing across per-device slot servers.

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

The reference is single-stream single-device (SURVEY.md §2.9); this is
beyond-reference capability built on serving/slots.
"""
from __future__ import annotations

from .slots import SlotEngine

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

    def _pick(self) -> SlotEngine:
        return min(self.servers, key=lambda s: s.in_flight)

    def submit(self, *args, **kwargs):
        return self._pick().submit(*args, **kwargs)

    def submit_stream(self, *args, **kwargs):
        return self._pick().submit_stream(*args, **kwargs)

    @property
    def in_flight(self) -> int:
        return sum(s.in_flight for s in self.servers)

    def stats(self) -> dict:
        per = [s.stats.snapshot() for s in self.servers]
        agg = {
            "servers": len(per),
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
