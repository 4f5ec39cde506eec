"""Observability: structured calibration/quantization reporting + profiling.

The reference's entire observability story is three stderr warnings through a
variadic ``print`` helper (reference: include/test_utils.h:3-27,
src/layer.cc:31,38,42). Here every converted layer exposes its calibrated
output range, derived (scale, zero_point), and weight scale as structured
records, emittable as JSON lines; ``trace`` wraps ``jax.profiler`` so serving
and benchmarks can capture TPU traces with one context manager.
"""

from __future__ import annotations

import contextlib
import json
import sys


def quantization_report(model) -> dict:
    """Per-layer quantization summary of a (converted or not) model.

    {layer: {type, is_quantized, scale, zero_point, weight_scale,
             calib: {count, min, max}}}
    """
    report = {}
    for name, layer in model.named_layers():
        report[name] = {
            "type": type(layer).__name__,
            "is_quantized": layer.is_quantized,
            "scale": layer.scale,
            "zero_point": layer.zero_point,
            "weight_scale": (
                layer.weight_scale if isinstance(layer.weight_scale, float)
                else [float(s) for s in layer.weight_scale]),
            "calib": layer.calib_stats,
        }
    return report


def log_quantization_report(model, stream=None) -> None:
    """Emit the report as JSON lines (one per layer)."""
    stream = stream if stream is not None else sys.stderr
    for name, rec in quantization_report(model).items():
        stream.write(json.dumps({"layer": name, **rec}) + "\n")
    stream.flush()


def device_op_times(log_dir: str) -> dict:
    """Aggregate device-side op durations from a ``trace(log_dir=...)`` run.

    Parses the newest trace.json.gz under ``log_dir`` and returns
    {op_name: {"ms": total_ms, "count": n}} for TPU/device events, sorted by
    time.  This is how the AlexNet fusion breakdown in CLAUDE.md was
    obtained; pair with the compiled HLO (``jax.jit(f).lower(...).compile()
    .as_text()``) to map fusion names back to source ops.
    """
    import glob
    import gzip

    paths = sorted(glob.glob(
        f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    out: dict = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        rec = out.setdefault(e["name"], {"ms": 0.0, "count": 0})
        rec["ms"] += e["dur"] / 1e3
        rec["count"] += 1
    return dict(sorted(out.items(), key=lambda kv: -kv[1]["ms"]))


@contextlib.contextmanager
def trace(name: str = "i8ie", log_dir: str | None = None):
    """Profile a region: ``jax.profiler`` trace when ``log_dir`` is given,
    plus a named TraceAnnotation either way."""
    import jax

    if log_dir:
        with jax.profiler.trace(log_dir):
            with jax.profiler.TraceAnnotation(name):
                yield
    else:
        with jax.profiler.TraceAnnotation(name):
            yield
