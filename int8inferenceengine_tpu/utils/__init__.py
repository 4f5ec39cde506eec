"""Utilities: checkpointing, observability."""

from . import checkpoint, equalize, hf, observe, roofline, validate
from .adaround import adaround
from .hf import from_hf
from .gptq import gptq
from .smooth import smooth, transformer_smooth_pairs
from .checkpoint import load, read_state_dict, save, state_dict
from .equalize import cross_layer_equalize
from .observe import log_quantization_report, quantization_report, trace

__all__ = [
    "checkpoint", "observe",
    "save", "load", "state_dict", "read_state_dict",
    "equalize", "cross_layer_equalize", "adaround",
    "smooth", "transformer_smooth_pairs", "gptq",
    "quantization_report", "log_quantization_report", "trace",
    "roofline", "validate", "hf", "from_hf",
]
