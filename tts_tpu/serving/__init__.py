"""Production serving layer: dynamic micro-batching over the batched
synthesis pipelines, plus a dependency-free HTTP front-end.

The reference is a single-stream script bundle (one request at a time per
ONNX session, SURVEY.md §3); serving is a capability this framework adds.
Design constraints come from the TPU execution model:

  * one dispatch thread owns the chip — batches are formed host-side and
    submitted serially (JAX dispatch is not usefully concurrent);
  * every jitted program is shape-specialized, so the batcher rounds the
    batch up to a fixed ladder of sizes (1/2/4/8 by default) with dummy
    pad requests instead of compiling per occupancy;
  * admission-time grouping ("dynamic micro-batching"), not mid-decode
    continuous batching: the decode `lax.while_loop`s run all rows to the
    slowest stream, which the per-row stop tracking already handles.
    Joining a running loop would need re-dispatch at a token boundary —
    measured round trips over the remote-chip transport (~30-70 ms,
    NOTES.md) make that a net loss at TTS decode lengths.
"""
from .batcher import BatchStats, MicroBatcher
from .server import TTSServer, serve_http

__all__ = ["MicroBatcher", "BatchStats", "TTSServer", "serve_http"]
