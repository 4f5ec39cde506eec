"""Serving: continuous-batching inference engine."""

from .engine import EngineStats, InferenceEngine

__all__ = ["InferenceEngine", "EngineStats"]
