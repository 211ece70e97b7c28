from .weight_only import (
    QTensor,
    QTensor4,
    dense,
    dequantize,
    quantize_int4,
    quantize_int8,
    quantize_pytree,
)

__all__ = ["QTensor", "QTensor4", "dense", "dequantize", "quantize_int4",
           "quantize_int8", "quantize_pytree"]
