"""Trace-time parallelism context.

Layers consult this context while the Module forward is being traced inside
``shard_map``: when a tensor-parallel axis is active, a channel-sharded layer
computes its local output-channel slice and all-gathers the result over the
``model`` axis (ICI) so the next layer sees full channels — the TP design
from SURVEY.md §2.4 (weights channel-sharded, activations all-gathered).
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses


@dataclasses.dataclass(frozen=True)
class ParallelAxes:
    data_axis: str = "data"
    model_axis: str = "model"
    data_size: int = 1
    model_size: int = 1
    # When True, TP-sharded Linears keep their outputs channel-sharded and
    # consumers overlap the gather with compute (ring GEMM) instead of
    # all-gathering at every layer boundary.
    overlap: bool = False


_current: contextvars.ContextVar[ParallelAxes | None] = contextvars.ContextVar(
    "i8ie_parallel_axes", default=None)


def current_axes() -> ParallelAxes | None:
    return _current.get()


@contextlib.contextmanager
def axes(pa: ParallelAxes):
    token = _current.set(pa)
    try:
        yield
    finally:
        _current.reset(token)
