"""AdaRound: adaptive weight rounding (Nagel et al., ICML 2020).

The fourth data-driven accuracy lever, alongside per-channel scales,
cross-layer equalization (utils/equalize.py) and bias correction
(QuantConfig.bias_correction).  Rounding each weight to the NEAREST code
is optimal per-weight but not per-LAYER: the layer-output error couples
weights through the input second moment, and choosing round-up vs
round-down per weight to minimize ``||W x - W~ x||`` recovers most of the
per-tensor quantization loss.

Method (faithful to the paper):

    W~ = s * clip(floor(W / s) + h(V), -127, 127)
    h(V) = clip(sigmoid(V) * (zeta - gamma) + gamma, 0, 1)   # rectified
    loss = ||W x - W~ x||^2 / n  +  lam * sum(1 - |2 h - 1|^beta)

with (zeta, gamma) = (1.1, -0.1), beta annealed 20 -> 2 so h is free early
and pushed to {0, 1} late; V initialized so h(V) equals the float
fractional part (i.e. the optimizer STARTS at round-to-nearest).  After
optimization the hard rounding ``floor + (h > 0.5)`` is stashed on the
layer; ``convert()`` then uses these integers with the standard scale.

TPU-native details: each layer optimizes as ONE jitted optax Adam loop
(``lax.scan`` over steps — no per-step dispatch), the layer-output loss
uses the same MXU ops as inference (dot / conv_general_dilated), and the
input activations come from the calibration batch via an eager tapped
forward (layers._INPUT_TAP).

Usage (between calibration and convert):

    net.prepare()
    net(q.tensor(x_calib))
    utils.adaround(net, x_calib)
    net.convert()
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..layers import _INPUT_TAP, Conv2d, Linear
from ..tensor import Tensor

__all__ = ["adaround"]

_ZETA, _GAMMA = 1.1, -0.1


def _h(v):
    return jnp.clip(jax.nn.sigmoid(v) * (_ZETA - _GAMMA) + _GAMMA, 0.0, 1.0)


# Single source of truth for "the scale convert() will use" — shared with
# utils.gptq and kept next to _quantize_weights in layers.py.
from ..layers import weight_quant_spec as _weight_scale  # noqa: E402


def _layer_out(layer, w, x):
    """FP32 layer output (no bias — rounding only affects the W x term)."""
    if isinstance(layer, Linear):
        return jnp.dot(x, w.T, preferred_element_type=jnp.float32)
    return lax.conv_general_dilated(
        x, w, window_strides=(layer.stride, layer.stride),
        padding=[(layer.padding, layer.padding)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=layer.groups,
        preferred_element_type=jnp.float32)


def _make_optimizer(layer, iters, lr, lam, bound=127.0):
    import optax

    opt = optax.adam(lr)

    def loss_fn(v, floor_w, s, x, out_ref, beta):
        w_soft = s * jnp.clip(floor_w + _h(v), -bound, bound)
        out = _layer_out(layer, w_soft, x)
        mse = jnp.mean(jnp.square(out - out_ref))
        reg = jnp.sum(1.0 - jnp.abs(2.0 * _h(v) - 1.0) ** beta)
        return mse + lam * reg

    @jax.jit
    def run(v0, floor_w, s, x, out_ref):
        state0 = opt.init(v0)

        def step(carry, i):
            v, state = carry
            # beta anneal 20 -> 2 over the run (paper's schedule shape)
            frac = i.astype(jnp.float32) / max(iters - 1, 1)
            beta = 20.0 * (1.0 - frac) + 2.0 * frac
            g = jax.grad(loss_fn)(v, floor_w, s, x, out_ref, beta)
            upd, state = opt.update(g, state)
            return (optax.apply_updates(v, upd), state), ()

        (v, _), _ = lax.scan(step, (v0, state0), jnp.arange(iters))
        return v

    return run


def adaround(net, x_calib, *, iters: int = 400, lr: float = 1e-2,
             lam: float = 1e-3, max_rows: int = 2048,
             max_images: int = 8, verbose: bool = False):
    """Optimize weight rounding for every Linear / Conv2d in ``net``.

    Call between calibration and ``convert()``; the optimized integer
    weights are used by the subsequent ``convert()``.  ``x_calib`` is a
    representative input batch (same thing the calibrator saw).
    ``max_rows`` / ``max_images`` subsample each layer's tapped input to
    bound the per-step cost.
    """
    if net.is_quant:
        raise RuntimeError("adaround must run before convert()")
    # Tap every target layer's input with one eager FP32 forward.
    # Observation is suspended for the tap: x_calib was already calibrated
    # by the user's prepare-phase forward, and re-observing it here would
    # double-inject the batch into quantile/mse reservoirs.
    tap: dict = {}
    token = _INPUT_TAP.set(tap)
    was_preparing = {id(l): l.is_preparing for _, l in net.named_layers()}
    try:
        for _, l in net.named_layers():
            l.is_preparing = False
        data = jnp.asarray(np.asarray(x_calib), jnp.float32)
        net.forward(Tensor(data))
    finally:
        for _, l in net.named_layers():
            l.is_preparing = was_preparing[id(l)]
        _INPUT_TAP.reset(token)

    rng = np.random.default_rng(0)
    for name, layer in net.named_layers():
        if not isinstance(layer, (Linear, Conv2d)):
            continue
        xs = tap.get(id(layer))
        if not xs:
            continue
        x = jnp.concatenate(xs, axis=0)
        if isinstance(layer, Linear) and x.shape[0] > max_rows:
            idx = rng.choice(x.shape[0], max_rows, replace=False)
            x = x[jnp.asarray(np.sort(idx))]
        elif isinstance(layer, Conv2d) and x.shape[0] > max_images:
            idx = rng.choice(x.shape[0], max_images, replace=False)
            x = x[jnp.asarray(np.sort(idx))]

        w, s, bound, group_scales = _weight_scale(layer)
        wf = w / s
        floor_w = jnp.floor(wf)
        frac = jnp.clip(wf - floor_w, 1e-4, 1 - 1e-4)
        # init h(V) = frac -> the optimizer starts at round-to-nearest
        v0 = -jnp.log((_ZETA - _GAMMA) / (frac - _GAMMA) - 1.0)
        out_ref = _layer_out(layer, w, x)
        v = _make_optimizer(layer, iters, lr, lam, bound)(v0, floor_w, s,
                                                          x, out_ref)
        q_w = jnp.clip(floor_w + (_h(v) > 0.5), -bound, bound
                       ).astype(jnp.int8)
        layer._adaround_qw = q_w
        if group_scales is not None:
            layer._adaround_scales = group_scales
        if verbose:
            nearest = jnp.clip(jnp.round(wf), -bound, bound)
            e_near = float(jnp.mean(jnp.square(
                _layer_out(layer, s * nearest, x) - out_ref)))
            e_ada = float(jnp.mean(jnp.square(
                _layer_out(layer, s * q_w.astype(jnp.float32), x)
                - out_ref)))
            flipped = int(jnp.sum(q_w != nearest.astype(jnp.int8)))
            print(f"adaround {name}: mse nearest {e_near:.3e} -> "
                  f"{e_ada:.3e} ({flipped} weights re-rounded)")
    return net
