from .weight_only import (
    QTensor,
    dense,
    dequantize,
    quantize_int8,
    quantize_pytree,
)

__all__ = ["QTensor", "dense", "dequantize", "quantize_int8",
           "quantize_pytree"]
