"""Streaming synthesis utilities.

The reference overlaps vocoder/VAE decode with the AR loop on a background
ThreadPoolExecutor and assembles sliding windows host-side
(Qwen_TTS/Export_Qwen_TTS_ONNX.py:2706-2726, VoxCPM/v1.5/Inference:511-523).
Under XLA, dispatch is already asynchronous — the TPU-native streaming
pattern is: run the AR loop in fixed-size chunks (one jitted while_loop per
chunk, carry threaded through), dispatch the codec decode of each finished
window, and materialize it one window LATE so the decode executes while the
next AR chunk is running. The host assembler below handles the
left-context overlap discard (the reference's chunked_decode /
SLIDE_WINDOW semantics, modeling_qwen3_tts_tokenizer_v2.py chunked_decode:
left_context_size=25).
"""
from __future__ import annotations

from typing import Callable, Iterator

import numpy as np

__all__ = ["ChunkedCodecStream"]


class ChunkedCodecStream:
    """Assembles streaming codec windows into audio.

    decode_fn(codes (1, W, G)) -> int16 (1, W * upsample): a jitted codec
    decode at the fixed window size. Each pushed window carries
    `left_context` frames of already-emitted codes whose audio is discarded
    after decode — the reference's overlap-discard
    (Export_Qwen_TTS_ONNX.py:2706-2726).

    Decodes are pipelined one window deep: `push_frames` dispatches the new
    window and returns the audio of the PREVIOUS one, so the device decode
    overlaps the caller's next AR chunk (the reference's executor overlap,
    without the thread).
    """

    def __init__(self, decode_fn: Callable, window: int, left_context: int,
                 upsample: int, num_groups: int):
        self.decode_fn = decode_fn
        self.window = window
        self.left_context = left_context
        self.upsample = upsample
        self.num_groups = num_groups
        self._codes: list[np.ndarray] = []      # (G,) frames
        self._decoded = 0                        # frames whose decode started
        self._pending = None                     # (device wav, ctx, n_new)

    def _ready(self, final: bool) -> bool:
        avail = len(self._codes) - self._decoded
        step = self.window - self.left_context
        return avail > 0 and (final or avail >= step)

    def _dispatch(self) -> None:
        start = max(self._decoded - self.left_context, 0)
        ctx = self._decoded - start
        chunk = np.asarray(self._codes[start:start + self.window])
        avail = len(self._codes) - self._decoded
        n_new = min(len(chunk) - ctx, avail)
        if len(chunk) < self.window:              # pad the tail window
            pad = np.repeat(chunk[-1:], self.window - len(chunk), axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        self._pending = (self.decode_fn(chunk[None]), ctx, n_new)
        self._decoded += n_new

    def _take_pending(self) -> np.ndarray | None:
        if self._pending is None:
            return None
        dev, ctx, n_new = self._pending
        self._pending = None
        wav = np.asarray(dev)                     # sync point
        wav = wav.reshape(-1)[ctx * self.upsample:
                              (ctx + n_new) * self.upsample]
        return wav.astype(np.int16)

    def push_frames(self, frames: np.ndarray) -> np.ndarray | None:
        """frames: (N, G) new codec frames. Dispatches a decode when a
        window completes and returns the previous window's audio (one-deep
        pipeline), else None."""
        self._codes.extend(list(frames))
        if not self._ready(final=False):
            return None
        out = self._take_pending()
        self._dispatch()
        return out

    def finish(self) -> Iterator[np.ndarray]:
        """Flush remaining frames and drain the pipeline."""
        while self._ready(final=True):
            out = self._take_pending()
            self._dispatch()
            if out is not None and len(out):
                yield out
        out = self._take_pending()
        if out is not None and len(out):
            yield out
