"""Serving: continuous-batching inference engine."""

from .engine import EngineStats, InferenceEngine
from .generation import GenerationEngine, GenerationStats

__all__ = ["InferenceEngine", "EngineStats", "GenerationEngine", "GenerationStats"]
