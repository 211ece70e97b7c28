from .attention import attention_mask, gqa_attention
from .mlp import gelu_mlp, gelu_tanh, swiglu
from .norm import l2_norm, layer_norm, rms_norm
from .rope import (
    apply_rope,
    apply_rope_interleaved,
    rope_table,
    rope_table_interleaved,
)

__all__ = [
    "attention_mask", "gqa_attention", "gelu_mlp", "gelu_tanh", "swiglu",
    "l2_norm", "layer_norm", "rms_norm",
    "apply_rope", "apply_rope_interleaved", "rope_table", "rope_table_interleaved",
]
