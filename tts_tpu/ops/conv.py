"""1-D convolution primitives in TPU-native feature-last (B, T, C) layout.

Weight layout is (width, in_ch, out_ch) — XLA's 'WIO' — so channel dims land
on MXU lanes. `conv_transpose1d` reproduces torch ConvTranspose1d semantics
(output length (T-1)*stride - 2*padding + kernel) via an input-dilated
conv_general_dilated with a flipped kernel, which XLA lowers onto the MXU
directly; depthwise variants use feature_group_count.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["conv1d", "conv_transpose1d", "depthwise_conv1d"]

_DN = ("NWC", "WIO", "NWC")

# MXU pass count for fp32 conv operands: HIGHEST = exact fp32 (6-pass
# emulation), None/DEFAULT = fastest (single bf16 pass). bf16 operands are
# single-pass either way. DSP/audio callers need HIGHEST for golden-test
# exactness; model forward paths run bf16 weights where this is moot.
# Module-level so perf experiments can A/B it (benchmarks/bigvgan_profile).
PRECISION = jax.lax.Precision.HIGHEST


def conv1d(
    x: jax.Array,            # (B, T, C_in)
    w: jax.Array,            # (K, C_in, C_out)
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jax.Array:
    if isinstance(padding, int):
        padding = (padding, padding)
    x = x.astype(w.dtype)   # compute dtype follows the weights (bf16 policy)
    if (groups == x.shape[-1] and w.shape[1] == 1 and stride == 1
            and w.shape[2] == groups):
        # depthwise stride-1: K dilated shifted multiply-adds. XLA's grouped
        # conv lowering is a TPU layout hazard (context-dependent 2x+ whole-
        # program slowdowns were measured); the FMA chain is exact and one
        # fused VPU pass.
        k = w.shape[0]
        t = x.shape[1] + padding[0] + padding[1] - dilation * (k - 1)
        xp = jnp.pad(x, ((0, 0), padding, (0, 0)))
        out = xp[:, : t] * w[0, 0]
        for i in range(1, k):
            out = out + xp[:, i * dilation : i * dilation + t] * w[i, 0]
        return out if b is None else out + b
    out = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=PRECISION,
    )
    if b is not None:
        out = out + b
    return out


def depthwise_conv1d(
    x: jax.Array,            # (B, T, C)
    w: jax.Array,            # (K, 1, C) — one filter per channel
    stride: int = 1,
    padding: int | tuple[int, int] = 0,
) -> jax.Array:
    return conv1d(x, w, None, stride=stride, padding=padding, groups=x.shape[-1])


def conv_transpose1d(
    x: jax.Array,            # (B, T, C_in)
    w: jax.Array,            # (K, C_in, C_out) — torch layout transposed to WIO
    b: jax.Array | None = None,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jax.Array:
    """torch.nn.ConvTranspose1d equivalent: out_len = (T-1)*stride - 2*pad + K."""
    k = w.shape[0]
    x = x.astype(w.dtype)
    out = jax.lax.conv_general_dilated(
        x, jnp.flip(w, 0),
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding),),
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=PRECISION,
    )
    if b is not None:
        out = out + b
    return out
