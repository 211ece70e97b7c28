"""Streaming synthesis utilities.

The reference overlaps vocoder/VAE decode with the AR loop on a background
ThreadPoolExecutor and assembles sliding windows host-side
(Qwen_TTS/Export_Qwen_TTS_ONNX.py:2706-2726, VoxCPM/v1.5/Inference:511-523).
Under XLA, dispatch is already asynchronous — the TPU-native streaming
pattern is: run the AR loop in fixed-size chunks (one jitted while_loop per
chunk, carry threaded through), and dispatch the codec decode of each
finished window while the next chunk is still running. The host assembler
below handles the left-context overlap discard (the reference's
chunked_decode / SLIDE_WINDOW semantics,
modeling_qwen3_tts_tokenizer_v2.py chunked_decode: left_context_size=25).
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
    """

    def __init__(self, decode_fn: Callable, window: int, left_context: int,
                 upsample: int, num_groups: int):
        self.decode_fn = decode_fn
        self.window = window
        self.left_context = left_context
        self.upsample = upsample
        self.num_groups = num_groups
        self._codes: list[np.ndarray] = []      # (G,) frames
        self._emitted = 0                        # frames already decoded
        self._pending = None                     # in-flight device array

    def push_frames(self, frames: np.ndarray) -> np.ndarray | None:
        """frames: (N, G) new codec frames. Returns an int16 chunk when a
        window completes, else None."""
        self._codes.extend(list(frames))
        return self._maybe_decode(final=False)

    def _maybe_decode(self, final: bool) -> np.ndarray | None:
        avail = len(self._codes) - self._emitted
        step = self.window - self.left_context
        if not final and avail < step:
            return None
        if avail <= 0:
            return None
        start = max(self._emitted - self.left_context, 0)
        ctx = self._emitted - start
        chunk = np.asarray(self._codes[start:start + self.window])
        n_new = min(len(chunk) - ctx, avail)
        if len(chunk) < self.window:              # pad the tail window
            pad = np.repeat(chunk[-1:], self.window - len(chunk), axis=0)
            chunk = np.concatenate([chunk, pad], axis=0)
        wav = np.asarray(self.decode_fn(chunk[None]))
        wav = wav.reshape(-1)[ctx * self.upsample:
                              (ctx + n_new) * self.upsample]
        self._emitted += n_new
        return wav.astype(np.int16)

    def finish(self) -> Iterator[np.ndarray]:
        """Flush remaining frames."""
        while True:
            out = self._maybe_decode(final=True)
            if out is None or len(out) == 0:
                break
            yield out
