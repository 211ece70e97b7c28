from .conv import conv1d, conv_transpose1d, depthwise_conv1d

__all__ = ["conv1d", "conv_transpose1d", "depthwise_conv1d"]
