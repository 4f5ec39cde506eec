"""Cross-layer equalization (CLE): a data-free PTQ accuracy lever.

Per-tensor weight quantization (the reference's scheme, src/layer.cc:6-26)
pays for channels with very different weight ranges: one joint scale wastes
codes on the widest channel.  CLE (Nagel et al., "Data-Free Quantization
Through Weight Equalization and Bias Correction", ICCV 2019, §4.1) fixes
this without data: for consecutive layers A -> f -> B where ``f`` is
positively homogeneous and channelwise (ReLU, max-pool), the function is
invariant under

    W_A[i,:] /= s_i      b_A[i] /= s_i      W_B[:,i] *= s_i

for any s_i > 0, so choosing ``s_i = sqrt(r_A_i / r_B_i)`` (r = per-channel
absolute weight range) equalizes both layers' channel ranges at
``sqrt(r_A_i * r_B_i)`` — shrinking the per-tensor quantization error of
both.  FP32 outputs are bit-for-bit unchanged up to float rounding; INT8
accuracy improves most for per-tensor configs (per-channel weight scales
already absorb the imbalance).

Usage — BEFORE ``prepare()``/``convert()`` (it rewrites FP32 weights, so
calibration must see the equalized model):

    from int8inferenceengine_tpu.utils import cross_layer_equalize
    cross_layer_equalize(net, [("conv1", "conv2"), ("fc1", "fc2")])
    net.prepare(); net(calib); net.convert()

Pairs must be chained output->input with only ReLU / max-pool between
(pooling is channelwise and positively homogeneous; a flatten between conv
and fc is NOT supported — channel identity is lost).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..layers import Conv2d, Linear


def _axes(layer):
    """(param_key, out_axis, in_axis) for a weight-bearing layer."""
    if isinstance(layer, Conv2d):
        return "w_hwio", 3, 2      # [kh, kw, cin/groups, cout]
    if isinstance(layer, Linear):
        return "weight", 0, 1      # [out, in]
    raise TypeError(f"cross_layer_equalize: unsupported layer {type(layer)}")


def _channel_range(w, channel_axis):
    reduce_axes = tuple(i for i in range(w.ndim) if i != channel_axis)
    return jnp.max(jnp.abs(w), axis=reduce_axes)


def cross_layer_equalize(model, pairs, iterations: int = 2,
                         eps: float = 1e-8):
    """Equalize each named (producer, consumer) layer pair in ``model``.

    ``pairs`` is a list of attribute-name tuples, e.g.
    ``[("conv1", "conv2")]``; chains share interior layers, so a couple of
    ``iterations`` over the list converge the whole chain.  Returns the
    model (weights rewritten in place; jit caches invalidated).
    """
    layers = dict(model.named_layers())
    resolved = []
    for a_name, b_name in pairs:
        try:
            a, b = layers[a_name], layers[b_name]
        except KeyError as e:
            raise KeyError(f"cross_layer_equalize: no layer {e.args[0]!r} "
                           f"in model") from None
        if a.is_quantized or b.is_quantized:
            raise RuntimeError(
                "cross_layer_equalize must run before convert() — "
                f"({a_name!r}, {b_name!r}) already quantized")
        if a.is_preparing or b.is_preparing:
            raise RuntimeError(
                "cross_layer_equalize must run before prepare() — "
                "calibration ranges observed on pre-equalization weights "
                "would silently mismatch the rewritten model")
        a_key, a_out, _ = _axes(a)
        b_key, _, b_in = _axes(b)
        if isinstance(b, Conv2d) and b.groups != 1:
            raise ValueError(
                f"cross_layer_equalize: consumer {b_name!r} is grouped — "
                "input-channel scaling would cross group boundaries")
        n_out = a.params[a_key].shape[a_out]
        n_in = b.params[b_key].shape[b_in]
        if n_out != n_in:
            raise ValueError(
                f"cross_layer_equalize: {a_name!r} out={n_out} != "
                f"{b_name!r} in={n_in} (is something between them "
                "reshaping channels?)")
        resolved.append((a, a_key, a_out, b, b_key, b_in))

    for _ in range(iterations):
        for a, a_key, a_out, b, b_key, b_in in resolved:
            wa, wb = a.params[a_key], b.params[b_key]
            r1 = jnp.maximum(_channel_range(wa, a_out), eps)
            r2 = jnp.maximum(_channel_range(wb, b_in), eps)
            s = jnp.sqrt(r1 / r2)
            a.params[a_key] = wa / jnp.expand_dims(
                s, tuple(i for i in range(wa.ndim) if i != a_out))
            if "bias" in a.params:
                a.params["bias"] = a.params["bias"] / s
            b.params[b_key] = wb * jnp.expand_dims(
                s, tuple(i for i in range(wb.ndim) if i != b_in))

    model._jit_fn = None
    model._jit_q_cache = {}
    model._calib_fn = None
    return model
