"""Generic autoregressive decode scaffold on lax.while_loop.

The reference drives AR decode as Python loops over per-step ONNX session
calls (SURVEY.md §3.2/§3.3); here the whole loop — step, stop check, token
buffer append — compiles into one XLA program with static (max_len) buffers,
so no host round-trips occur per token.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["DecodeState", "decode_loop"]


class DecodeState(NamedTuple):
    carry: Any             # model state pytree (kv cache, hidden, ...)
    save_ids: jax.Array    # (B, max_len) int32 decoded tokens
    num_decoded: jax.Array # () int32
    last_token: jax.Array  # (B,) int32
    finished: jax.Array    # () bool


def decode_loop(
    step_fn: Callable[[DecodeState], tuple[Any, jax.Array]],
    init_carry: Any,
    first_token: jax.Array,   # (B,) int32 token that seeds the loop
    max_len: int,
    stop_ids: tuple[int, ...],
    batch: int = 1,
) -> DecodeState:
    """Run `step_fn` until a stop token or max_len.

    step_fn(state) -> (new_carry, next_token (B,)); it consumes
    state.last_token / state.carry and returns the next token. Token 0 of the
    output buffer is `first_token` itself only if the caller wrote it; by
    convention save_ids holds tokens *emitted by* step_fn.
    """
    save_ids = jnp.zeros((batch, max_len), jnp.int32)

    def cond(s: DecodeState):
        return (~s.finished) & (s.num_decoded < max_len)

    def body(s: DecodeState):
        new_carry, tok = step_fn(s)
        save_ids = jax.lax.dynamic_update_slice(
            s.save_ids, tok[:, None], (0, s.num_decoded)
        )
        stopped = jnp.zeros((), bool)
        for sid in stop_ids:
            stopped = stopped | jnp.any(tok == sid)
        return DecodeState(
            carry=new_carry,
            save_ids=save_ids,
            num_decoded=s.num_decoded + 1,
            last_token=tok,
            finished=stopped,
        )

    init = DecodeState(
        carry=init_carry,
        save_ids=save_ids,
        num_decoded=jnp.zeros((), jnp.int32),
        last_token=first_token,
        finished=jnp.zeros((), bool),
    )
    return jax.lax.while_loop(cond, body, init)
