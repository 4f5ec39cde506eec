"""Utilities: checkpointing, observability."""

from . import checkpoint, observe, roofline, validate
from .checkpoint import load, read_state_dict, save, state_dict
from .observe import log_quantization_report, quantization_report, trace

__all__ = [
    "checkpoint", "observe",
    "save", "load", "state_dict", "read_state_dict",
    "quantization_report", "log_quantization_report", "trace",
    "roofline", "validate",
]
