"""Production serving layer: request batching over the synthesis
pipelines, plus a dependency-free HTTP front-end.

The reference is a single-stream script bundle (one request at a time per
ONNX session, SURVEY.md §3); serving is a capability this framework adds.
Design constraints come from the TPU execution model:

  * one dispatch thread owns the chip — batches are formed host-side and
    submitted serially (JAX dispatch is not usefully concurrent);
  * every jitted program is shape-specialized, so batch shapes are fixed:
    the MicroBatcher rounds admission-time batches up a ladder of sizes
    (1/2/4/8) with dummy pad requests; the slot servers decode a FIXED
    batch of B slots in bounded chunks instead of compiling per occupancy.

Two batching modes:

  * `MicroBatcher` — admission-time grouping: requests that arrive
    together share one decode while_loop. Minimal dispatch overhead, but
    a request arriving mid-decode waits for the whole batch — queueing
    dominates p99 at production rates.
  * slot servers (`serving/slots.SlotEngine` adapters: `KaniSlotServer`,
    `QwenSlotServer`, `IndexTTSSlotServer`) — CONTINUOUS batching:
    chunked jitted decode with mid-decode admission via offset prefill +
    row splice (byte-equal to solo decode). Measured on-chip at
    4 rps x 32 requests: p50 6.50 s / p99 10.21 s vs 57.58 / 59.38 s
    admission batching (benchmarks/serving_bench.py).
"""
from .batcher import BatchStats, MicroBatcher
from .continuous import KaniSlotServer
from .devices import pipeline_device, pipelines_for_devices, replicate_pipeline
from .router import SlotRouter
from .server import TTSServer, serve_http
from .slots import SlotEngine, SlotStats, StreamHandle

__all__ = ["MicroBatcher", "BatchStats", "TTSServer", "serve_http",
           "SlotEngine", "SlotStats", "StreamHandle", "SlotRouter",
           "KaniSlotServer", "QwenSlotServer", "IndexTTSSlotServer",
           "F5SlotServer", "VoxCPMSlotServer",
           "continuous_server", "default_request_body",
           "replicate_pipeline", "pipelines_for_devices",
           "pipeline_device"]

_LAZY = {
    "QwenSlotServer": "continuous_qwen",
    "IndexTTSSlotServer": "continuous_indextts",
    "F5SlotServer": "continuous_f5",
    "VoxCPMSlotServer": "continuous_voxcpm",
    "continuous_server": "families",
    "default_request_body": "families",
}


def __getattr__(name):
    # lazy: the family adapters pull in their model stacks
    if name in _LAZY:
        import importlib

        return getattr(importlib.import_module(f".{_LAZY[name]}", __name__),
                       name)
    raise AttributeError(name)
