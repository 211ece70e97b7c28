"""Static-shape KV cache.

The reference threads growing KV tensors through ONNX graph I/O, concatenating
each step (SURVEY.md §2.8 item 6). Under XLA that would force recompilation, so
the TPU-native design preallocates (L, B, KVH, max_T, D) buffers and appends
with dynamic_update_slice; attention masks out positions >= length. Buffers are
donated through lax.while_loop carries so decode runs fully on-device.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["KVCache"]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "length"],
    meta_fields=[],
)
@dataclasses.dataclass
class KVCache:
    """k, v: (num_layers, batch, kv_heads, max_len, head_dim); length: ()"""

    k: jax.Array
    v: jax.Array
    length: jax.Array  # int32 scalar — number of valid positions

    @classmethod
    def create(
        cls,
        num_layers: int,
        batch: int,
        kv_heads: int,
        max_len: int,
        head_dim: int,
        dtype=jnp.bfloat16,
    ) -> "KVCache":
        shape = (num_layers, batch, kv_heads, max_len, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            length=jnp.zeros((), jnp.int32),
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[3]

    def update_layer(self, layer: int, k_new: jax.Array, v_new: jax.Array):
        """Write (B, S, KVH, D) new keys/values at the current length for one
        layer; returns (cache, k_full, v_full) where the full views are
        (B, KVH, max_T, D) for attention. Does NOT advance length — call
        advance() once after all layers.

        Layout note: the write is ONE dynamic_update_slice on the stacked
        5-D buffer. The earlier slice-out / update / re-insert form
        (`dynamic_update_index_in_dim(self.k, updated_layer, layer, 0)`)
        defeated XLA's in-place while-loop carry pattern and copied the
        whole (L, B, KVH, T, D) buffer every layer — measured 3.5 ms/step
        on the Qwen talker at max_len=2048 vs 1.2 ms at 512 purely from
        those copies."""
        k_new = jnp.swapaxes(k_new, 1, 2).astype(self.k.dtype)  # (B, KVH, S, D)
        v_new = jnp.swapaxes(v_new, 1, 2).astype(self.v.dtype)
        pos = self.length
        k_buf = jax.lax.dynamic_update_slice(
            self.k, k_new[None], (layer, 0, 0, pos, 0))
        v_buf = jax.lax.dynamic_update_slice(
            self.v, v_new[None], (layer, 0, 0, pos, 0))
        cache = dataclasses.replace(self, k=k_buf, v=v_buf)
        return cache, k_buf[layer], v_buf[layer]

    def advance(self, num_tokens) -> "KVCache":
        return dataclasses.replace(self, length=self.length + num_tokens)

    def rewind(self, length) -> "KVCache":
        """Set length to a (possibly traced) value <= current. Used after a
        batched prefill over a padded bucket: decode then appends at the true
        prompt length, overwriting the padded garbage, and the causal mask
        (keys < pos+s) never exposes it."""
        return dataclasses.replace(
            self, length=jnp.asarray(length, jnp.int32))

    def repeat_batch(self, n: int) -> "KVCache":
        """Tile batch dim (beam-search expansion, reference FIRST_BEAM_SEARCH
        Kani_TTS/Export_Kani_TTS.py:110-112)."""
        return dataclasses.replace(
            self,
            k=jnp.tile(self.k, (1, n, 1, 1, 1)),
            v=jnp.tile(self.v, (1, n, 1, 1, 1)),
        )

    def select_batch(self, idx: jax.Array) -> "KVCache":
        """Reorder batch rows (beam pruning, reference SECOND_BEAM_SEARCH
        Kani_TTS/Export_Kani_TTS.py:151-152)."""
        return dataclasses.replace(
            self, k=jnp.take(self.k, idx, axis=1), v=jnp.take(self.v, idx, axis=1)
        )
