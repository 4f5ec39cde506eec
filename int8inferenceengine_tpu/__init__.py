"""TPU-native INT8 post-training-quantization inference engine.

A brand-new JAX/XLA/Pallas framework with the capabilities of the reference
CPU engine ``t0037799/INT8InferenceEngine`` (see SURVEY.md): a torch-flavored
``Module``/``Linear``/``Conv2d``/``tensor`` API, a
``load -> prepare -> calibrate -> convert`` PTQ lifecycle, per-tensor
asymmetric-u8 activations x symmetric-s8 weights with int32 accumulation and
fused requantization — executed on the TPU MXU (Pallas int8 GEMM kernels and
native XLA integer convolutions) instead of MKL ``gemm_s8u8s32`` + OpenMP,
and scaled over device meshes with channel-sharded weights.

Public API mirrors ``i8ie/__init__.py:6-10`` plus the quantization entry
points.
"""

from .config import DEFAULT_CONFIG, QuantConfig
from .layers import (Conv2d, Layer, Linear, QuantAct, QuantAdd, QuantConcat,
                     QuantEmbed, QuantLayerNorm, QuantMatmul, QuantMoE,
                     QuantMul,
                     QuantPosEmbed, QuantRMSNorm, QuantRoPE, QuantSoftmax)
from .module import Module, TruncDepthWarning
from .ops.functional import argmax, dequantize, max_pool2d, quantize, relu
from .tensor import Tensor, tensor

__all__ = [
    "tensor", "argmax", "relu", "max_pool2d",
    "Linear", "Conv2d", "Tensor", "Layer", "Module",
    "QuantAdd", "QuantConcat", "QuantMul", "QuantAct",
    "QuantMatmul", "QuantSoftmax", "QuantLayerNorm", "QuantPosEmbed",
    "QuantEmbed", "QuantRMSNorm", "QuantRoPE", "QuantMoE",
    "quantize", "dequantize",
    "QuantConfig", "DEFAULT_CONFIG", "TruncDepthWarning",
]

__version__ = "0.1.0"
