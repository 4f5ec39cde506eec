"""Param sharding + shard_map execution of the quantized forward.

Design (SURVEY.md §2.4 / BASELINE north star): a ``(data, model)`` mesh;
batch sharded over ``data``; conv/fc weights sharded by OUTPUT CHANNEL over
``model``; each layer computes its local channel slice on the MXU and
all-gathers activations over ICI so the next layer sees full channels.
XLA overlaps the all-gather of layer i's output with unrelated work where it
can; a manually overlapped Pallas GEMM+collective variant is the planned
next step.

Layers whose output channels don't divide the model axis (e.g. a 10-class
head) stay replicated — correctness first, the big GEMMs still shard.

The forward itself runs under ``jax.shard_map`` (Pallas kernels can't be
auto-partitioned by GSPMD), with the same user ``forward`` code: layers pick
up the active axes from parallel.context and insert their own all-gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..layers import Conv2d, Layer, Linear


def layer_param_specs(layer: Layer, model_axis: str, model_size: int,
                      role: str = "col") -> dict:
    """PartitionSpec per param array; None-spec (replicated) when the layer
    can't shard evenly over the model axis.

    ``role`` (from ``Module.tp_roles``): 'col' — output-channel sharding,
    output all-gathered (the default); 'col_local' — same sharding but the
    output STAYS a channel shard (head-local attention / a row-parallel
    consumer); 'row' — Linear-only input-channel sharding, partial s32
    accumulators psummed before one requant (layers.Linear
    ._forward_int8_row).  Roles that don't apply fall back to 'col'.
    """
    layer._tp_local = False
    layer._tp_row = False
    layer._tp_expert = False
    if role == "expert":
        # expert parallelism (QuantMoE): the [E, ...] stacked expert
        # arrays shard on axis 0; the router (and the layer's routing
        # math) replicates; forward computes local experts densely and
        # psums partial combines (layers.QuantMoE._moe — bit-exact for
        # top_k <= 2).
        e = getattr(layer, "n_experts", 0)
        if (e > 0 and model_size > 1 and e % model_size == 0
                and not layer.quant_fallback):
            layer._tp_expert = True
            return {k: (P() if k == "router" else P(model_axis))
                    for k in layer.params}
        role = "col"                    # -> replicated fallback below
    w4a8 = (isinstance(layer, Linear) and not layer.config.weight_only
            and layer.config.weight_bits == 4)
    if role == "row":
        in_channels = getattr(layer, "in_channels", 0)
        row_ok = (isinstance(layer, Linear) and model_size > 1
                  and in_channels % model_size == 0
                  and not layer.quant_fallback
                  and not layer.config.weight_only
                  and not w4a8)       # W4A8: no integer partials to psum
        if row_ok:
            layer._tp_row = True
            layer._tp_sharded = False
            specs = {}
            for k in layer.params:
                if k == "qw_kn":               # [K, N] -> K sharded
                    specs[k] = P(model_axis, None)
                elif k == "weight":            # [N, K] torch layout
                    specs[k] = P(None, model_axis)
                elif k == "rowsum":            # restacked [ms, N]
                    specs[k] = P(model_axis, None)
                else:                          # q_bias/bias/w_scale: once
                    specs[k] = P()
            return specs
        role = "col"
    out_channels = getattr(layer, "out_channels", 0)  # weightless layers
    # Grouped convs tie output channels to input-channel groups; with fully
    # gathered activations their channel shards would need per-shard input
    # slices, so they stay replicated (depthwise convs are k^2*C cheap — the
    # 1x1 pointwise convs around them carry the FLOPs and still shard).
    grouped = getattr(layer, "groups", 1) > 1
    # W4A8 Linears stay REPLICATED under TP: their param scheme
    # (w4_packed/w4_scales/w4_wsum + float bias) has no sharding rules
    # here, and a half-sharded layer (bias split, packed weights whole)
    # would be silently wrong — DP still applies; use weight_bits=8 for
    # tensor-parallel serving.
    shardable = (out_channels > 0 and out_channels % model_size == 0
                 and model_size > 1 and not grouped and not w4a8)
    layer._tp_sharded = shardable
    layer._tp_local = shardable and role == "col_local"
    if not shardable:
        return {k: P() for k in layer.params}
    specs = {}
    for k, v in layer.params.items():
        if k in ("q_bias", "bias", "rowsum", "w_scale"):
            specs[k] = P(model_axis)
        elif k == "qw_kn":                 # [K, N]
            specs[k] = P(None, model_axis)
        elif k == "weight":                # [N, K] torch layout
            specs[k] = P(model_axis, None)
        elif k in ("qw_hwio", "w_hwio"):   # [kh, kw, I, O]
            specs[k] = P(None, None, None, model_axis)
        else:
            specs[k] = P()
    return specs


def module_param_specs(module, model_axis: str, model_size: int) -> dict:
    roles = module.tp_roles(model_size) if hasattr(module, "tp_roles") \
        else {}
    return {
        name: layer_param_specs(layer, model_axis, model_size,
                                role=roles.get(name, "col"))
        for name, layer in module.named_layers()
    }


def shard_module(module, mesh, data_axis: str = "data",
                 model_axis: str = "model", overlap: bool = False) -> None:
    """Place layer params on the mesh and switch the Module to shard_map
    execution.  Call after convert() (or before, for FP32 serving).

    ``overlap=True`` turns on ring tensor parallelism for Linear chains:
    sharded Linears keep their outputs channel-sharded, and a consuming
    sharded Linear runs the ring GEMM (parallel/overlap.py) instead of
    waiting on an all-gather; any other consumer gathers lazily.  Results
    are bit-identical to gather mode (integer partial sums are exact)."""
    from .context import ParallelAxes, axes as axes_ctx

    data_size = mesh.shape[data_axis]
    model_size = mesh.shape[model_axis]
    specs = module_param_specs(module, model_axis, model_size)

    # Move params onto the mesh now (one host->HBM transfer per weight).
    for name, layer in module.named_layers():
        rs = layer.params.get("rowsum")
        if layer._tp_row and rs is not None:
            if rs.ndim != 2 or rs.shape[0] != model_size:
                # restack (or re-stack for a different mesh) the rowsum
                # into per-shard local rowsums [model_size, N], straight
                # from the weights: shard s's row = sum over its K rows
                # of qw_kn.  _forward_int8_row's psum of the local
                # corrections then reproduces the full offset exactly.
                qw = layer.params["qw_kn"]
                k, n = qw.shape
                layer.params["rowsum"] = (
                    jnp.asarray(qw).astype(jnp.int32)
                    .reshape(model_size, k // model_size, n).sum(axis=1))
        elif not layer._tp_row and rs is not None and rs.ndim == 2:
            # was row-parallel on a previous mesh: collapse the stacked
            # per-shard rowsums back to the full [N] (exact integer sum)
            layer.params["rowsum"] = rs.sum(axis=0)
        layer.params = {
            k: jax.device_put(v, NamedSharding(mesh, specs[name][k]))
            for k, v in layer.params.items()
        }

    pa = ParallelAxes(data_axis=data_axis, model_axis=model_axis,
                      data_size=data_size, model_size=model_size,
                      overlap=overlap)

    module._mesh = mesh
    module._parallel_axes = pa
    module._tp_specs = specs
    module._jit_q_cache = {}  # unsharded quantized-input fns are stale now
    module._jit_fn = jax.jit(sharded_forward(module))
    module._shardings = None  # shard_map handles placement


def sharded_forward(module, input_scale=None, input_zero_point=None,
                    ingest=None):
    """Build the shard_map-wrapped forward for a sharded Module.

    With ``input_scale``/``input_zero_point`` set, the traced forward treats
    its input as pre-quantized u8 at that (scale, zp) — the DataLoader
    host-ingest fast path (module.py _call_quantized) — instead of float
    input quantized inside the program.  ``ingest`` is the optional
    host-pre-layout tag (tensor.py Tensor._ingest).  Wrap the result in
    jax.jit.
    """
    from .context import axes as axes_ctx

    mesh, pa, specs = module._mesh, module._parallel_axes, module._tp_specs
    data_axis = pa.data_axis

    def _fwd(params, data):
        def local_fn(local_params, local_data):
            from ..tensor import Tensor
            module._bind(local_params)
            try:
                with axes_ctx(pa):
                    if input_scale is None:
                        t = Tensor(local_data)
                    else:
                        t = Tensor(local_data, input_scale, input_zero_point,
                                   _ingest=ingest)
                    out = module._run(t)
                    if out._tp_sharded:   # overlap mode: gather once at exit
                        return gather_channels(out.logical_data, 1)
                    return out.logical_data
            finally:
                module._bind(None)

        return jax.shard_map(
            local_fn, mesh=mesh,
            in_specs=(specs, P(data_axis)),
            out_specs=P(data_axis),
            check_vma=False,
        )(params, data)

    return _fwd


def gather_channels(x, axis: int):
    """All-gather a channel-sharded activation over the model axis (ICI).

    No-op when no TP context is active.
    """
    from .context import current_axes
    pa = current_axes()
    if pa is None or pa.model_size <= 1:
        return x
    return jax.lax.all_gather(x, pa.model_axis, axis=axis, tiled=True)
