"""Roofline accounting: per-layer FLOPs/bytes and %-of-peak for a model.

The reference publishes only wall-clock tables (reference README.md:26-48);
the north star asks for roofline-level accounting per kernel.  Layers emit
(flops, bytes) records into layers._COST_SINK while the forward is traced
(``jax.eval_shape`` — no device work), and this module turns them into a
report; given a measured per-batch time it adds achieved TOP/s, GB/s, and
%-of-peak against the chip's published ceilings.
"""

from __future__ import annotations

import contextvars
import jax

from ..layers import _COST_SINK
from ..tensor import Tensor

# Published per-chip peaks (dense) — conservative public numbers.
CHIP_PEAKS = {
    # name fragment -> (int8 OPS, bf16 FLOPS, HBM bytes/s)
    "v5 lite": (394.7e12, 197.3e12, 819e9),   # TPU v5e
    "v5p": (918e12, 459e12, 2765e9),
    "v4": (275e12, 275e12, 1228e9),
    "v6": (1836e12, 918e12, 1640e9),          # Trillium
}
DEFAULT_PEAK = (394.7e12, 197.3e12, 819e9)


def _peaks_for(device) -> tuple:
    name = getattr(device, "device_kind", "").lower()
    for frag, peaks in CHIP_PEAKS.items():
        if frag in name:
            return peaks
    return DEFAULT_PEAK


def collect(model, input_shape, batch: int) -> dict:
    """Trace one forward at ``(batch,)+input_shape`` and collect per-layer
    (flops, bytes).  Works for FP32 and converted models; no device work."""
    import jax.numpy as jnp

    name_of = {id(layer): name for name, layer in model.named_layers()}
    data = jax.ShapeDtypeStruct((batch,) + tuple(input_shape), jnp.float32)

    def _fwd(params, x):
        model._bind(params)
        try:
            return model._run(Tensor(x)).logical_data
        finally:
            model._bind(None)

    sink: list = []
    token = _COST_SINK.set(sink)
    try:
        jax.eval_shape(_fwd, model._gather_params(), data)
    finally:
        _COST_SINK.reset(token)

    per_layer = {}
    for layer, flops, nbytes in sink:
        name = name_of.get(id(layer), repr(layer))
        rec = per_layer.setdefault(name, {"flops": 0, "bytes": 0})
        rec["flops"] += flops
        rec["bytes"] += nbytes
    return {
        "batch": batch,
        "total_flops": sum(r["flops"] for r in per_layer.values()),
        "total_bytes": sum(r["bytes"] for r in per_layer.values()),
        "per_layer": per_layer,
    }


def report(model, input_shape, batch: int, measured_s: float | None = None,
           quantized: bool | None = None) -> dict:
    """Roofline report; with ``measured_s`` (seconds per batch) adds achieved
    throughput and %-of-peak for the matching precision."""
    rep = collect(model, input_shape, batch)
    int8_peak, bf16_peak, hbm = _peaks_for(jax.devices()[0])
    quantized = model.is_quant if quantized is None else quantized
    peak = int8_peak if quantized else bf16_peak
    rep["precision"] = "int8" if quantized else "f32/bf16"
    rep["peak_ops"] = peak
    rep["peak_hbm_Bps"] = hbm
    rep["sol_compute_s"] = rep["total_flops"] / peak
    rep["sol_memory_s"] = rep["total_bytes"] / hbm
    if measured_s is not None:
        rep["measured_s"] = measured_s
        rep["achieved_ops"] = rep["total_flops"] / measured_s
        rep["percent_of_peak"] = 100.0 * rep["achieved_ops"] / peak
        rep["percent_of_sol"] = 100.0 * max(
            rep["sol_compute_s"], rep["sol_memory_s"]) / measured_s
    return rep
